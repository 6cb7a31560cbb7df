"""Calgary corpus discovery — the acceptance fixture set.

The reference vendors the 14-file Calgary corpus and hard-codes the list
(`/root/reference/main.cpp:417-419`).  We locate it via $BMH_CORPUS_DIR with
the reference tree as a fallback, so tests degrade gracefully elsewhere.
"""

from __future__ import annotations

import os
from pathlib import Path

CALGARY_FILES = [
    "bib", "book1", "book2", "geo", "news", "obj1", "obj2",
    "paper1", "paper2", "pic", "progc", "progl", "progp", "trans",
]

# Per-file reference compressed sizes (header + tree + payload), from
# /root/reference/README.md:23-36, re-verified in BASELINE.md.
REFERENCE_SIZES = {
    "bib": 33205, "book1": 267163, "book2": 186994, "geo": 69563,
    "news": 133517, "obj1": 11785, "obj2": 88733, "paper1": 18224,
    "paper2": 28136, "pic": 101508, "progc": 13699, "progl": 18745,
    "progp": 12826, "trans": 22400,
}

DEFAULT_DIR = "/root/reference/cmake-build-release/calgarycorpus"


def corpus_dir() -> Path | None:
    d = Path(os.environ.get("BMH_CORPUS_DIR", DEFAULT_DIR))
    return d if d.is_dir() else None


def corpus_path(name: str) -> Path | None:
    d = corpus_dir()
    if d is None:
        return None
    p = d / name
    return p if p.is_file() else None


def read_corpus_file(name: str) -> bytes | None:
    p = corpus_path(name)
    return p.read_bytes() if p else None
