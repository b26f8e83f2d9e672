"""Local model-asset verification before enabling a real translate model.

Mirrors the reference's pre-flight check (src/download_model.py:15-62):
before the translate pipeline is allowed to load MarianMT from a local
cache, every required asset category must resolve to a file inside the
newest HuggingFace-layout snapshot directory. The reference runs this
after download and the translate CLI trusts it; here it gates
``cmd_translate --model-dir`` so the day a real ``model_fn`` is wired in
(torch present), a half-downloaded cache fails fast instead of deep in
an executor.

This module is pure stdlib (no transformers import) so it is fully
testable in this container.
"""
from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

DEFAULT_MODEL = "Helsinki-NLP/opus-mt-en-he"

# category -> acceptable file names (any one satisfies the category),
# per the reference's required_files table (src/download_model.py:36-44)
REQUIRED_ASSETS: dict[str, tuple[str, ...]] = {
    "model": ("model.safetensors", "pytorch_model.bin"),
    "config": ("config.json",),
    "tokenizer": ("tokenizer_config.json", "tokenizer.json"),
    "vocabulary": ("vocab.json",),
    "source_spm": ("source.spm",),
    "target_spm": ("target.spm",),
}


@dataclass
class CacheReport:
    ok: bool
    snapshot_dir: str | None
    found: dict[str, str] = field(default_factory=dict)
    missing: list[str] = field(default_factory=list)
    error: str | None = None


def _hub_dir_name(model_name: str) -> str:
    return "models--" + model_name.replace("/", "--")


def _resolve_snapshot(model_dir: str, snapshots: list[str]) -> str:
    """Pick the snapshot ``transformers`` itself would resolve: the commit
    hash recorded in ``refs/main`` when that file exists and points at one
    of the snapshot dirs; otherwise the most recently modified snapshot
    (NOT the lexicographically first — hashes carry no ordering, and a
    stale partial snapshot can sort before the complete one)."""
    ref_path = os.path.join(model_dir, "refs", "main")
    if os.path.isfile(ref_path):
        try:
            with open(ref_path, encoding="utf-8") as fh:
                commit = fh.read().strip()
        except OSError:
            commit = ""
        if commit:
            ref_snap = os.path.join(model_dir, "snapshots", commit)
            if os.path.isdir(ref_snap):
                return ref_snap
    return max(snapshots, key=os.path.getmtime)


def verify_model_cache(
    cache_dir: str, model_name: str = DEFAULT_MODEL
) -> CacheReport:
    """Check that ``cache_dir`` holds a complete HuggingFace-hub cache of
    ``model_name``: locate the ``models--org--name`` directory anywhere
    under the cache, resolve the snapshot transformers would use
    (``refs/main`` when present, else newest mtime — see
    ``_resolve_snapshot``), and require one file per asset category.
    Returns a CacheReport (ok=False + reason rather than raising, so CLI
    callers can emit a structured error)."""
    if not os.path.isdir(cache_dir):
        return CacheReport(False, None, error=f"cache dir not found: {cache_dir}")
    pattern = os.path.join(
        glob.escape(cache_dir), "**", _hub_dir_name(model_name)
    )
    model_dirs = sorted(glob.glob(pattern, recursive=True))
    if not model_dirs:
        return CacheReport(
            False, None, error=f"no {_hub_dir_name(model_name)} under {cache_dir}"
        )
    snapshots = sorted(
        d
        for d in glob.glob(os.path.join(glob.escape(model_dirs[0]), "snapshots", "*"))
        if os.path.isdir(d)
    )
    if not snapshots:
        return CacheReport(False, None, error=f"no snapshots in {model_dirs[0]}")
    snap = _resolve_snapshot(model_dirs[0], snapshots)
    found: dict[str, str] = {}
    missing: list[str] = []
    for category, names in REQUIRED_ASSETS.items():
        hit = next(
            (n for n in names if os.path.exists(os.path.join(snap, n))), None
        )
        if hit is None:
            missing.append(category)
        else:
            found[category] = hit
    return CacheReport(not missing, snap, found=found, missing=missing)
