"""Engine configuration source: YAML profiles + environment override merge.

Replicates the reference's config semantics (SURVEY.md §2.A8 — reference:
src/neo4j_client.py:30-80 and config/neo4j_config.sample.yaml:7-31):

1. a YAML file holds named profiles (``default``, ``cluster``, ...) plus
   root-level sections;
2. the selected profile (arg > ``SPARK_GRAFT_PROFILE`` env > ``default``,
   falling back to the ``default`` profile when the name is unknown — same
   fallback as the reference's ``config.get(profile, config['default'])``)
   is merged over the root-level config;
3. individual keys are then overridden from environment variables, with
   numeric values validated (invalid numbers are skipped with a warning,
   mirroring reference :58-68);
4. required fields are validated last (reference :70-74).

Falsy YAML values ("" / 0 / null) mean "unset — use the engine default",
so a sample file can list every key without pinning machine-specific
values.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CONFIG_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "config",
    "engine_config.yaml",
)

# env var -> config key (reference env_mapping, :45-55)
ENV_MAPPING = {
    "SPARK_GRAFT_MASTER": "master",
    "SPARK_GRAFT_CPUS": "cpus",
    "SPARK_GRAFT_DRIVER_MEM": "driver_memory",
    "SPARK_GRAFT_MAX_RESULT_SIZE": "max_result_size",
    "SPARK_GRAFT_SHUFFLE_PARTITIONS": "shuffle_partitions",
    "SPARK_GRAFT_WAREHOUSE": "warehouse_dir",
    "SPARK_GRAFT_SF_DIR": "sf_dir",
    "SPARK_GRAFT_LOG_LEVEL": "log_level",
}

_INT_KEYS = {"cpus", "shuffle_partitions"}

# Keys that must be present (possibly falsy-default) after the merge; the
# engine has a built-in default for everything, so this guards against a
# config file that explicitly nulls a key out (reference :70-74 pattern).
REQUIRED_FIELDS = ("master", "cpus")

DEFAULTS: dict[str, object] = {
    "master": "",  # "" -> local[cpus]
    "cpus": 0,  # 0 -> all cores
    "driver_memory": "",
    "max_result_size": "",
    "shuffle_partitions": 0,  # 0 -> cpus
    "warehouse_dir": "",
    "sf_dir": "",
    "log_level": "INFO",
}


def load_config(
    config_path: str | None = None, profile: str | None = None
) -> dict:
    """Load engine config: DEFAULTS <- yaml root <- yaml profile <- env.

    A missing file is fine (env-only operation, the round-1 behavior);
    an unreadable/invalid file raises.
    """
    if profile is None:
        profile = os.getenv("SPARK_GRAFT_PROFILE", "default")

    merged: dict = dict(DEFAULTS)

    path = config_path or (
        DEFAULT_CONFIG_PATH if os.path.exists(DEFAULT_CONFIG_PATH) else None
    )
    if path is not None:
        import yaml

        with open(path) as f:
            file_cfg = yaml.safe_load(f) or {}
        profile_cfg = file_cfg.get(profile, file_cfg.get("default", {})) or {}
        for k, v in file_cfg.items():
            if not isinstance(v, dict):  # root-level scalars
                merged[k] = v
        merged.update(profile_cfg)

    for env_var, key in ENV_MAPPING.items():
        if env_var in os.environ:
            value: object = os.environ[env_var]
            if key in _INT_KEYS:
                try:
                    value = int(value)  # type: ignore[arg-type]
                except ValueError:
                    logger.warning(
                        "Invalid numeric value for %s: %s", env_var, value
                    )
                    continue
            merged[key] = value

    missing = [k for k in REQUIRED_FIELDS if k not in merged]
    if missing:
        raise ValueError(
            f"Missing required configuration fields: {', '.join(missing)}"
        )
    for k in _INT_KEYS:
        if merged.get(k) and not isinstance(merged[k], int):
            raise ValueError(f"Configuration field {k!r} must be an integer")
    merged["profile"] = profile
    return merged
