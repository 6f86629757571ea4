"""Configuration / credentials source (SURVEY.md S3).

The reference wires its secrets two ways: DB credentials from
environment variables (``dags/etl.py:16-23`` — ``DB_HOST``/``DB_NAME``/
``DB_USER``/``DB_PASSWORD``, ``sslmode=require``) and the API key as a
constant (``dags/etl.py:8``).  The engine's re-expression is a typed,
redacting config object:

* :meth:`EngineConfig.from_env` reads the same variable names (prefix
  overridable), so a reference deployment's environment works as-is;
* secrets never appear in ``repr``/``str`` — config objects end up in
  logs and Spark UI descriptions, so redaction is the default, not an
  option;
* :meth:`EngineConfig.apply` plants the *non-secret* knobs on the
  SparkSession (so executors and ``foreachBatch`` closures can read
  them via ``spark.conf``); secrets stay driver-side and are handed
  directly to the components that need them (the REST ``fetch_fn``,
  a JDBC writer) — shipping credentials through Spark conf broadcasts
  them to every executor log.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields

from pyspark.sql import SparkSession

_REDACTED = "****"


@dataclass(frozen=True)
class DbConfig:
    """Postgres-shaped sink credentials (``dags/etl.py:16-23``)."""

    host: str | None = None
    name: str | None = None
    user: str | None = None
    password: str | None = field(default=None, repr=False)
    sslmode: str = "require"

    def __repr__(self) -> str:  # redact even with repr=False belt+braces
        return (
            f"DbConfig(host={self.host!r}, name={self.name!r}, "
            f"user={self.user!r}, password={_REDACTED!r}, "
            f"sslmode={self.sslmode!r})"
        )

    def jdbc_url(self) -> str:
        """``df.write.jdbc``-ready URL (K1 JDBC staging parity path)."""
        return f"jdbc:postgresql://{self.host}/{self.name}?sslmode={self.sslmode}"

    def jdbc_properties(self) -> dict[str, str]:
        return {
            "user": self.user or "",
            "password": self.password or "",
            "driver": "org.postgresql.Driver",
        }


@dataclass(frozen=True)
class EngineConfig:
    """All engine knobs in one typed object."""

    api_key: str | None = field(default=None, repr=False)
    db: DbConfig = field(default_factory=DbConfig)
    fetch_delay_s: float = 0.4  # dags/etl.py:136 time.sleep(0.4)
    api_units: str = "metric"  # dags/etl.py:28-29 request params
    api_lang: str = "vi"
    api_timeout_s: int = 15

    def __repr__(self) -> str:
        return (
            f"EngineConfig(api_key={_REDACTED!r}, db={self.db!r}, "
            f"fetch_delay_s={self.fetch_delay_s!r}, "
            f"api_units={self.api_units!r}, api_lang={self.api_lang!r}, "
            f"api_timeout_s={self.api_timeout_s!r})"
        )

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> EngineConfig:
        """Read the reference's variable names (``dags/etl.py:16-23``),
        plus ``WEATHER_API_KEY`` for the key the reference hardcodes."""
        e = os.environ if env is None else env
        return cls(
            api_key=e.get("WEATHER_API_KEY"),
            db=DbConfig(
                host=e.get("DB_HOST"),
                name=e.get("DB_NAME"),
                user=e.get("DB_USER"),
                password=e.get("DB_PASSWORD"),
                sslmode=e.get("DB_SSLMODE", "require"),
            ),
            fetch_delay_s=float(e.get("WEATHER_FETCH_DELAY_S", "0.4")),
        )

    def apply(self, spark: SparkSession) -> None:
        """Plant the NON-secret knobs as runtime confs (readable from
        executors / foreachBatch); secrets deliberately excluded."""
        spark.conf.set("spark.data_engineer_project_weather_analytics_spark.fetch_delay_s", str(self.fetch_delay_s))
        spark.conf.set("spark.data_engineer_project_weather_analytics_spark.api_units", self.api_units)
        spark.conf.set("spark.data_engineer_project_weather_analytics_spark.api_lang", self.api_lang)
        spark.conf.set("spark.data_engineer_project_weather_analytics_spark.api_timeout_s", str(self.api_timeout_s))


def secret_fields() -> tuple[str, ...]:
    """Names of fields that must never be logged (audited by tests)."""
    return ("api_key", "password")


__all__ = ["DbConfig", "EngineConfig", "secret_fields"]


def _assert_no_secret_in_repr(cfg: EngineConfig) -> None:
    """Test helper: every secret value must be absent from repr(cfg)."""
    rendered = repr(cfg) + repr(cfg.db)
    for f in fields(cfg):
        if f.name == "api_key" and cfg.api_key:
            assert cfg.api_key not in rendered
    if cfg.db.password:
        assert cfg.db.password not in rendered
