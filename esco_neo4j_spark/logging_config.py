"""Log sink: console + file handler (SURVEY.md §2.A11 — reference:
src/logging_config.py:4-30).

Same shape as the reference: create the log directory, configure the root
logger with a stream handler and a ``<log_dir>/esco.log`` file handler,
and demote the chatty framework loggers (the reference demotes ``neo4j``
and ``urllib3``; our equivalents are ``py4j`` and ``pyspark``).
"""

from __future__ import annotations

import logging
import os

LOG_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def setup_logging(
    level: int | str = logging.INFO, log_dir: str | None = None
) -> logging.Logger:
    """Configure console + file logging for all engine modules.

    ``log_dir`` defaults to ``$SPARK_GRAFT_LOG_DIR`` or ``./logs``.
    ``force=True`` so repeated CLI invocations in one process reconfigure
    cleanly instead of stacking handlers.
    """
    if isinstance(level, str):
        level = getattr(logging, level.upper(), logging.INFO)
    log_dir = log_dir or os.environ.get("SPARK_GRAFT_LOG_DIR", "logs")
    os.makedirs(log_dir, exist_ok=True)
    logging.basicConfig(
        level=level,
        format=LOG_FORMAT,
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(log_dir, "esco.log")),
        ],
        force=True,
    )
    logging.getLogger("py4j").setLevel(logging.WARNING)
    logging.getLogger("pyspark").setLevel(logging.WARNING)
    return logging.getLogger("esco_neo4j_spark")
