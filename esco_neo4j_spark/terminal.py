"""Terminal sink formatting — SURVEY.md §2 A9 parity with the reference
CLI (src/esco_cli.py:19-94): ANSI color-coded headers/sections/results,
the 100-char description truncation, and the per-relationship "first 5
... and N more" related-nodes block.

Color output is gated exactly like the reference (src/esco_cli.py:30-34):
disabled when $NO_COLOR is set or stdout is not a tty, so piped/CI output
is plain text.
"""

from __future__ import annotations

import json
import os
import sys


class Colors:
    """ANSI color codes (reference src/esco_cli.py:19-28)."""

    HEADER = "\033[95m"
    BLUE = "\033[94m"
    GREEN = "\033[92m"
    YELLOW = "\033[93m"
    RED = "\033[91m"
    ENDC = "\033[0m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"


def colorize(text: str, color: str) -> str:
    """Wrap ``text`` in ANSI codes if the terminal supports it
    (reference src/esco_cli.py:30-34)."""
    if os.getenv("NO_COLOR") or not sys.stdout.isatty():
        return text
    return f"{color}{text}{Colors.ENDC}"


def print_header(text: str) -> None:
    """80-column section header (reference src/esco_cli.py:36-40)."""
    print("\n" + "=" * 80)
    print(colorize(f" {text} ".center(80, "="), Colors.HEADER))
    print("=" * 80 + "\n")


def print_section(text: str) -> None:
    """80-column subsection header (reference src/esco_cli.py:42-46)."""
    print("\n" + "-" * 80)
    print(colorize(f" {text} ".center(80, "-"), Colors.BLUE))
    print("-" * 80 + "\n")


def print_result(result: dict, index: int | None = None) -> None:
    """One search hit: ``N. [Type] label (Score: s)`` plus the
    description truncated at 100 chars (reference src/esco_cli.py:48-65).
    """
    prefix = f"{index}. " if index is not None else "• "
    type_str = colorize(f"[{result['type']}]", Colors.YELLOW)
    score_str = colorize(f"(Score: {result['score']:.4f})", Colors.GREEN)
    print(f"{prefix}{type_str} {result['label']} {score_str}")
    if result.get("description"):
        desc = result["description"]
        if len(desc) > 100:
            desc = desc[:97] + "..."
        print(f"   {colorize('Description:', Colors.BOLD)} {desc}")


def print_related_nodes(related_graph: dict | None) -> None:
    """Related entities grouped by relationship: title-cased rel name
    with count, first 5 node labels, then ``... and N more``
    (reference src/esco_cli.py:67-91)."""
    if not related_graph:
        return
    node = related_graph["node"]
    print_section(f"Related entities for '{node['label']}'")
    for rel_type, rel_nodes in related_graph["related"].items():
        if not rel_nodes:
            continue
        rel_type_display = rel_type.replace("_", " ").title()
        count = len(rel_nodes)
        print(f"\n{colorize(rel_type_display, Colors.BOLD)} ({count}):")
        for n in rel_nodes[:5]:
            print(f"  • {n['label']}")
        if count > 5:
            print(f"  ... and {count - 5} more")


def format_json_output(data) -> str:
    """JSON sink formatting (reference src/esco_cli.py:92-94)."""
    return json.dumps(data, indent=2, ensure_ascii=False)
