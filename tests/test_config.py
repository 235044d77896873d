"""EngineConfig (C6): explicit-beats-env precedence and the
IAM-role → keys → anonymous credential chain
(reference import_events.py:9-36)."""

from __future__ import annotations

from fxa_activity_metrics_spark.config import Credentials, EngineConfig
from fxa_activity_metrics_spark.session import get_spark


def test_credential_chain_iam_wins():
    c = Credentials(iam_role="arn:aws:iam::1:role/x", access_key_id="k", secret_access_key="s")
    assert c.resolve() == "iam"
    assert "spark.hadoop.fs.s3a.assumed.role.arn" in c.storage_conf()


def test_credential_chain_keys_fallback():
    c = Credentials(access_key_id="k", secret_access_key="s")
    assert c.resolve() == "keys"
    assert c.storage_conf()["spark.hadoop.fs.s3a.access.key"] == "k"


def test_credential_chain_anonymous():
    assert Credentials().resolve() == "anonymous"
    assert Credentials(access_key_id="k").resolve() == "anonymous", (
        "a key without its secret must not half-configure key auth"
    )
    assert Credentials().storage_conf() == {}


def test_from_env_reads_environment(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "16")
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "4g")
    monkeypatch.setenv("SPARK_GRAFT_IAM_ROLE", "arn:aws:iam::1:role/env")
    cfg = EngineConfig.from_env()
    assert cfg.shuffle_partitions == 16
    assert cfg.driver_memory == "4g"
    assert cfg.credentials.resolve() == "iam"


def test_explicit_beats_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "16")
    cfg = EngineConfig.from_env(shuffle_partitions=64)
    assert cfg.shuffle_partitions == 64
    conf = cfg.spark_conf()
    assert conf["spark.sql.shuffle.partitions"] == "64"


def test_explicit_none_forces_default(monkeypatch):
    """An explicit None override must win over the environment —
    'defer to default' is a stateable choice, not a dropped key."""
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "16")
    cfg = EngineConfig.from_env(shuffle_partitions=None)
    assert cfg.shuffle_partitions is None
    assert "spark.sql.shuffle.partitions" not in cfg.spark_conf()


def test_unknown_override_fails_loudly():
    import pytest

    with pytest.raises(TypeError, match="shuffle_partitons"):
        EngineConfig.from_env(shuffle_partitons=8)  # typo'd key


def test_spark_conf_merges_extra():
    cfg = EngineConfig(
        shuffle_partitions=8,
        credentials=Credentials(access_key_id="k", secret_access_key="s"),
        extra_conf={"spark.custom": "v"},
    )
    conf = cfg.spark_conf()
    assert conf["spark.sql.shuffle.partitions"] == "8"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "k"
    assert conf["spark.custom"] == "v"


def test_get_spark_accepts_config(spark):
    """Session construction from a config object (the running shared
    session is returned by getOrCreate; the config path must not
    error and must keep the engine's UTC pin)."""
    cfg = EngineConfig.from_env(app_name="cfg-session")
    s = get_spark(config=cfg)
    assert s.conf.get("spark.sql.session.timeZone") == "UTC"
