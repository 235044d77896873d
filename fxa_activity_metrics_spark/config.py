"""Engine configuration object (C6).

The reference resolves its runtime config from a ``config.json`` with
an IAM-role → access-keys fallback chain for storage credentials
(import_events.py:9-36: ``aws.iamrole`` wins, else
``aws.key``/``aws.secret``, interpolated into the COPY statement's
CREDENTIALS clause). This module is that contract re-shaped for a
Spark deployment:

- :class:`Credentials` — the same fallback chain; ``resolve()``
  yields which mechanism applies, ``storage_conf()`` maps it onto
  Hadoop-FS style configuration keys (the Spark analogue of the COPY
  CREDENTIALS string). Locally — a filesystem lake — the chain
  resolves to ``anonymous`` and contributes nothing.
- :class:`EngineConfig` — explicit-beats-environment precedence for
  every knob ``session.get_spark`` honors, so a program can construct
  a session from a config object alone while ops environments keep
  driving everything through ``SPARK_GRAFT_*`` variables.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


@dataclass(frozen=True)
class Credentials:
    """Storage credential chain (import_events.py:9-36): an IAM role
    beats explicit keys; neither means anonymous/instance-profile
    access."""

    iam_role: str | None = None
    access_key_id: str | None = None
    secret_access_key: str | None = None

    @classmethod
    def from_env(cls) -> "Credentials":
        return cls(
            iam_role=os.environ.get("SPARK_GRAFT_IAM_ROLE") or None,
            access_key_id=os.environ.get("SPARK_GRAFT_ACCESS_KEY") or None,
            secret_access_key=os.environ.get("SPARK_GRAFT_SECRET_KEY") or None,
        )

    def resolve(self) -> str:
        """Which mechanism applies: 'iam' | 'keys' | 'anonymous'."""
        if self.iam_role:
            return "iam"
        if self.access_key_id and self.secret_access_key:
            return "keys"
        return "anonymous"

    def storage_conf(self) -> dict[str, str]:
        """Spark/Hadoop conf entries for the resolved mechanism —
        the COPY-CREDENTIALS analogue. Key names follow the public
        hadoop-aws convention; a local filesystem lake ignores them."""
        mech = self.resolve()
        if mech == "iam":
            return {
                "spark.hadoop.fs.s3a.aws.credentials.provider": (
                    "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider"
                ),
                "spark.hadoop.fs.s3a.assumed.role.arn": self.iam_role or "",
            }
        if mech == "keys":
            return {
                "spark.hadoop.fs.s3a.access.key": self.access_key_id or "",
                "spark.hadoop.fs.s3a.secret.key": self.secret_access_key or "",
            }
        return {}


@dataclass(frozen=True)
class EngineConfig:
    """Session + pipeline knobs with explicit-beats-env precedence.

    ``None`` means "defer to the environment / engine default" — the
    same layering the reference gets from config.json overriding
    nothing and env overriding config (Makefile envsubst)."""

    app_name: str | None = None
    master: str | None = None
    shuffle_partitions: int | None = None
    driver_memory: str | None = None
    credentials: Credentials = field(default_factory=Credentials)
    extra_conf: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, **overrides) -> "EngineConfig":
        """Environment-driven config; keyword overrides win over env
        (explicit > env > default). Passing an explicit ``None``
        forces that knob back to "defer to default" even when the
        environment sets it — absence and None are distinguished by
        key presence, not value. Unknown keys fail here with a clear
        message instead of surfacing as a dataclass TypeError."""
        valid = {f.name for f in fields(cls)}
        unknown = sorted(set(overrides) - valid)
        if unknown:
            raise TypeError(
                f"unknown EngineConfig override(s) {unknown}; "
                f"valid fields: {sorted(valid)}"
            )
        env_master = os.environ.get("SPARK_GRAFT_MASTER") or None
        env_shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE")
        base = {
            "master": env_master,
            "shuffle_partitions": int(env_shuffle) if env_shuffle else None,
            "driver_memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM") or None,
            "credentials": Credentials.from_env(),
        }
        base.update(overrides)
        if base.get("credentials") is None:
            base["credentials"] = Credentials()
        return cls(**base)

    def spark_conf(self) -> dict[str, str]:
        """The conf dict this config contributes on top of the engine
        defaults in ``session.get_spark``."""
        out: dict[str, str] = {}
        if self.shuffle_partitions is not None:
            out["spark.sql.shuffle.partitions"] = str(self.shuffle_partitions)
        if self.driver_memory is not None:
            out["spark.driver.memory"] = self.driver_memory
        out.update(self.credentials.storage_conf())
        out.update(self.extra_conf)
        return out
