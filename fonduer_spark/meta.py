"""Engine lifecycle singleton — the reference's ``Meta`` re-targeted.

The reference ``Meta`` (src/fonduer/meta.py:60-160) owns the Postgres
engine + sessionmaker and the tutorial call shape is::

    from fonduer import Meta, init_logging
    init_logging(log_dir="logs")
    session = Meta.init("postgresql://...").Session()

Here the engine is a SparkSession and the storage root is the snapshot
warehouse (checkpoints.SnapshotTable trees), so the same two lines yield a
driver session::

    from fonduer_spark.meta import Meta, init_logging
    init_logging(log_dir="logs")
    spark = Meta.init("spark-warehouse").Session()
"""

from __future__ import annotations

import logging
import os
import tempfile
from datetime import datetime
from typing import Optional

logger = logging.getLogger(__name__)


def init_logging(
    log_dir: str = tempfile.gettempdir(),
    format: str = "[%(asctime)s][%(levelname)s] %(name)s:%(lineno)s - %(message)s",
    level: int = logging.INFO,
) -> None:
    """Configure logging into a fresh timestamped directory under
    ``log_dir`` (reference meta.py:18-57 — same idempotence: a second call
    is a no-op that reports the existing path)."""
    if not Meta.log_path:
        dt = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        log_path = os.path.join(log_dir, dt)
        os.makedirs(log_path, exist_ok=True)
        logging.basicConfig(
            format=format,
            level=level,
            handlers=[
                logging.FileHandler(
                    os.path.join(log_path, "fonduer_spark.log")),
                logging.StreamHandler(),
            ],
        )
        logger.info(f"Setting logging directory to: {log_path}")
        Meta.log_path = log_path
    else:
        logger.info(
            f"Logging was already initialized to use {Meta.log_path}. "
            "To configure logging manually, call init_logging before "
            "initializing Meta."
        )


class Meta:
    """Singleton bootstrap: ``Meta.init(warehouse).Session()`` returns the
    SparkSession (the reference returns a DB session factory; the call
    shape ports 1:1). ``warehouse`` is the snapshot-table root used by
    CheckpointedPipeline."""

    spark = None
    warehouse: Optional[str] = None
    log_path: Optional[str] = None

    @classmethod
    def init(cls, warehouse: str = "spark-warehouse",
             cores: Optional[int] = None, **spark_cfg) -> type:
        if cls.spark is None:
            from .session import get_spark

            kwargs = {} if cores is None else {"cores": cores}
            kwargs.update(spark_cfg)
            cls.spark = get_spark(**kwargs)
            cls.warehouse = os.path.abspath(warehouse)
            os.makedirs(cls.warehouse, exist_ok=True)
            logger.info(f"Initialized engine at warehouse {cls.warehouse}")
        elif warehouse and cls.warehouse != os.path.abspath(warehouse):
            raise ValueError(
                f"Meta already initialized with warehouse {cls.warehouse}; "
                "call Meta.reset() to re-init elsewhere"
            )
        elif cores is not None or spark_cfg:
            # the singleton survives re-init: a caller asking for a
            # different session config would otherwise silently get the
            # old one (mirrors the warehouse-mismatch branch, but a config
            # drift is a warning rather than an error — the session is
            # still usable, just not resized)
            logger.warning(
                "Meta already initialized; ignoring cores=%r spark_cfg=%r "
                "for the live session — call Meta.reset() to re-init with "
                "a new configuration", cores, spark_cfg)
        return cls

    @classmethod
    def Session(cls):
        if cls.spark is None:
            raise ValueError("call Meta.init(...) first")
        return cls.spark

    @classmethod
    def pipeline(cls, signature: str):
        """A CheckpointedPipeline rooted at the warehouse — the analogue of
        opening a DB session against Meta's engine."""
        from .checkpoints import CheckpointedPipeline

        return CheckpointedPipeline(cls.Session(), cls.warehouse, signature)

    @classmethod
    def reset(cls) -> None:
        """Forget the singleton (tests / warehouse switches); does not stop
        the SparkSession — the caller owns that lifecycle."""
        cls.spark = None
        cls.warehouse = None
