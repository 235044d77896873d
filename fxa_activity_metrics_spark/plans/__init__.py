"""Job drivers: incremental batch orchestration (reference control plane)."""
