"""Deterministic synthesis of the two ESCO CSVs absent from the snapshot.

The reference snapshot at /root/reference/ESCO/ is missing
``skills_en.csv`` and ``occupationSkillRelations_en.csv``
(.MISSING_LARGE_BLOBS:1-2). Per FIXTURES.md §A2/§A6, we synthesize them
deterministically (md5-keyed, no RNG state) from the URIs the *real*
relation CSVs reference, so the ingested graph is closed: every edge
endpoint exists, hierarchy queries traverse real ESCO structure, and
repeated synthesis is byte-identical (stable warehouse for oracles).

Shapes exercised on purpose (FIXTURES.md): quoted fields with embedded
newlines in altLabels, pipe-separated multi-values, skills shared across
occupations (co-occurrence), occupations spanning ISCO groups.
"""

from __future__ import annotations

import csv
import hashlib
import os

_WORDS = (
    "analyse manage design operate maintain plan develop coordinate inspect "
    "repair instruct evaluate supervise negotiate document research advise "
    "assemble calibrate monitor forecast audit procure weld program model "
    "translate harvest diagnose schedule budget"
).split()

SKILL_TYPES = ("skill/competence", "knowledge")
REUSE_LEVELS = ("sector-specific", "cross-sector", "transversal", "occupation-specific")


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _words(key: str, n: int) -> str:
    return " ".join(_WORDS[_h(f"{key}:{i}") % len(_WORDS)] for i in range(n))


def _skill_uris(esco_dir: str) -> list[str]:
    """Skill URIs referenced by the real relation files, minus URIs already
    present in skillGroups_en.csv (those are Skill+SkillGroup nodes; the
    reference's MERGE (s:Skill {conceptUri}) would hit the existing node,
    reference src/esco_ingest.py:98,115)."""
    groups: set[str] = set()
    with open(os.path.join(esco_dir, "skillGroups_en.csv"), newline="") as f:
        for row in csv.DictReader(f):
            groups.add(row["conceptUri"])
    uris: set[str] = set()
    with open(
        os.path.join(esco_dir, "broaderRelationsSkillPillar_en.csv"), newline=""
    ) as f:
        for row in csv.DictReader(f):
            uris.add(row["conceptUri"])
            uris.add(row["broaderUri"])
    with open(os.path.join(esco_dir, "skillSkillRelations_en.csv"), newline="") as f:
        for row in csv.DictReader(f):
            uris.add(row["originalSkillUri"])
            uris.add(row["relatedSkillUri"])
    return sorted(uris - groups)


def synth_skills_csv(esco_dir: str, out_path: str) -> int:
    """skills_en.csv per FIXTURES.md §A2. Returns row count."""
    uris = _skill_uris(esco_dir)
    cols = (
        "conceptType conceptUri skillType reuseLevel preferredLabel altLabels "
        "hiddenLabels status modifiedDate scopeNote definition inScheme "
        "description"
    ).split()
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols, quoting=csv.QUOTE_MINIMAL)
        w.writeheader()
        for u in uris:
            h = _h(u)
            label = _words(u, 2 + h % 3)
            # every 7th altLabels embeds a newline (multiLine CSV parity)
            alt = (
                f"{_words(u + ':a', 2)}\n{_words(u + ':b', 2)}"
                if h % 7 == 0
                else f"{_words(u + ':a', 2)} | {_words(u + ':b', 2)}"
            )
            w.writerow(
                {
                    "conceptType": "KnowledgeSkillCompetence",
                    "conceptUri": u,
                    "skillType": SKILL_TYPES[h % 2],
                    "reuseLevel": REUSE_LEVELS[h % 4],
                    "preferredLabel": label,
                    "altLabels": alt,
                    "hiddenLabels": "",
                    "status": "released",
                    "modifiedDate": "2016-12-20T17:43:43Z",
                    "scopeNote": "",
                    "definition": "",
                    "inScheme": "http://data.europa.eu/esco/concept-scheme/skills",
                    "description": _words(u + ":d", 8),
                }
            )
    return len(uris)


def synth_occupation_skill_relations_csv(
    esco_dir: str, skills_csv: str, out_path: str
) -> int:
    """occupationSkillRelations_en.csv per FIXTURES.md §A6.

    Each occupation gets 4-9 skills picked md5-deterministically; picks are
    clustered by the occupation's ISCO group so skills are shared across
    occupations (co-occurrence, AQ:127-131). Returns row count.
    """
    occs: list[tuple[str, str]] = []  # (uri, iscoGroup)
    with open(os.path.join(esco_dir, "occupations_en.csv"), newline="") as f:
        for row in csv.DictReader(f):
            occs.append((row["conceptUri"], row.get("iscoGroup") or ""))
    skills: list[tuple[str, str]] = []  # (uri, skillType)
    with open(skills_csv, newline="") as f:
        for row in csv.DictReader(f):
            skills.append((row["conceptUri"], row["skillType"]))
    n_sk = len(skills)
    rows = 0
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL)
        w.writerow(["occupationUri", "relationType", "skillType", "skillUri"])
        for uri, isco in sorted(occs):
            k = 4 + _h(uri + ":n") % 6
            # half the picks cluster on the ISCO major group -> shared skills
            cluster = _h("cluster:" + isco[:1]) % n_sk
            for i in range(k):
                if i % 2 == 0:
                    idx = (cluster + _h(f"{uri}:{i}") % 37) % n_sk
                else:
                    idx = _h(f"{uri}:{i}") % n_sk
                s_uri, s_type = skills[idx]
                rel = "essential" if _h(f"{uri}:{s_uri}") % 3 else "optional"
                w.writerow([uri, rel, s_type, s_uri])
                rows += 1
    return rows


def ensure_fixture_csvs(esco_dir: str, fixture_dir: str) -> dict[str, str]:
    """Synthesize the missing CSVs into fixture_dir (idempotent; files are
    deterministic so a re-run writes identical bytes). Returns
    {csv_name: path} for the synthesized files."""
    os.makedirs(fixture_dir, exist_ok=True)
    skills_path = os.path.join(fixture_dir, "skills_en.csv")
    rel_path = os.path.join(fixture_dir, "occupationSkillRelations_en.csv")
    if not os.path.exists(skills_path):
        synth_skills_csv(esco_dir, skills_path)
    if not os.path.exists(rel_path):
        synth_occupation_skill_relations_csv(esco_dir, skills_path, rel_path)
    return {
        "skills_en.csv": skills_path,
        "occupationSkillRelations_en.csv": rel_path,
    }
