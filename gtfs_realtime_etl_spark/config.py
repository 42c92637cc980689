"""Per-agency deployment configuration.

The reference is multi-city via env-driven pydantic settings — feed URL,
API key + header, IANA timezone, poll cadence, destination bucket per
agency (reference ``etl/infrastructure/config.py:11-38``, consumed by
``deploy.sh:4-8`` and read back inside the lambda from env,
``etl/runtime/handler.py``).  This module replicates that deployment
story without pydantic (not in the container): one stdlib dataclass, an
env loader with the same field names, and helpers that wire the config
into the session factory, the HTTP poller, and the streaming ingest.

Two cities = two env prefixes = two ``AgencyConfig``s driving two
independent pipelines in the same process (or two jobs on a cluster).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql import SparkSession

#: Default env prefix; reference vars are unprefixed (VEH_POSITION_URL),
#: but a prefix is what makes multi-agency-per-environment possible.
DEFAULT_ENV_PREFIX = "GTFS_ETL_"


@dataclass(frozen=True)
class AgencyConfig:
    """One agency's deployment settings (reference ETLSettings parity).

    Field-for-field mirror of ``etl/infrastructure/config.py:11-38``:
    ``veh_position_url``, ``schedule_seconds``, ``timezone``,
    ``destination_bucket`` (here ``lake_root`` — any Hadoop-FS URI, not
    only S3), ``api_key``/``api_key_header``; plus the app/stage naming
    fields of ``config.py:14-26`` collapsed into ``name``.
    """

    name: str = "gtfs-realtime-etl"
    veh_position_url: str | None = None
    schedule_seconds: int = 60
    timezone: str = "America/Edmonton"
    lake_root: str | None = None
    api_key: str | None = None
    api_key_header: str | None = None

    @classmethod
    def from_env(
        cls,
        prefix: str = DEFAULT_ENV_PREFIX,
        env: Mapping[str, str] | None = None,
    ) -> "AgencyConfig":
        """Build a config from ``{prefix}{FIELD}`` environment variables
        (the reference's lambda reads the same unprefixed names from its
        deploy env; pass ``prefix=""`` for drop-in parity)."""
        env = os.environ if env is None else env

        def get(name: str, default: str | None = None) -> str | None:
            return env.get(f"{prefix}{name}", default)

        return cls(
            name=get("APP_NAME", "gtfs-realtime-etl"),
            veh_position_url=get("VEH_POSITION_URL"),
            schedule_seconds=int(get("SCHEDULE_SECONDS", "60")),
            timezone=get("TIMEZONE", "America/Edmonton"),
            lake_root=get("DESTINATION_BUCKET"),
            api_key=get("API_KEY"),
            api_key_header=get("API_KEY_HEADER"),
        )

    # -- wiring helpers ----------------------------------------------------

    def request_headers(self) -> dict[str, str]:
        """HTTP headers for the feed fetch (handler.py builds the same
        single-header dict from API_KEY_HEADER/API_KEY)."""
        if self.api_key and self.api_key_header:
            return {self.api_key_header: self.api_key}
        return {}

    def session(self, **kwargs) -> SparkSession:
        """SparkSession with this agency's timezone pinned."""
        from gtfs_realtime_etl_spark.session import get_spark

        kwargs.setdefault("app_name", self.name)
        kwargs.setdefault("timezone", self.timezone)
        return get_spark(**kwargs)

    def poll_once(self, out_dir: str, **kwargs) -> str:
        """One configured feed fetch into the file-stream inbox."""
        from gtfs_realtime_etl_spark.sources.poller import poll_feed_once

        if not self.veh_position_url:
            raise ValueError("veh_position_url is not configured")
        kwargs.setdefault("headers", self.request_headers())
        return poll_feed_once(self.veh_position_url, out_dir, **kwargs)

    def start_ingest(
        self,
        spark: SparkSession,
        feed_dir: str,
        checkpoint_dir: str,
        available_now: bool = False,
    ):
        """Start this agency's file-stream ingest into its lake root at
        its configured cadence."""
        from gtfs_realtime_etl_spark.streaming.ingest import start_feed_file_stream

        if not self.lake_root:
            raise ValueError("lake_root (DESTINATION_BUCKET) is not configured")
        return start_feed_file_stream(
            spark,
            feed_dir=feed_dir,
            lake_root=self.lake_root,
            checkpoint_dir=checkpoint_dir,
            trigger_seconds=self.schedule_seconds,
            available_now=available_now,
        )
