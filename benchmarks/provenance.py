"""Shared benchmark provenance: one git_commit()/stamp() instead of four
copy-pasted subprocess blocks (round-4 review finding)."""

from __future__ import annotations

import datetime
import os
import subprocess


def git_commit() -> str:
    """Short HEAD hash, or 'unknown' for non-git checkouts (including the
    rev-parse-succeeds-but-prints-nothing case)."""
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
        return out or "unknown"
    except Exception:
        return "unknown"


def stamp() -> dict:
    return {"date": datetime.date.today().isoformat(),
            "commit": git_commit()}
