"""Deployment-artifact hygiene.

kgpipe.zip is build output regenerated at spark-submit time (README's
`zip -r kgpipe.zip kgpipe && spark-submit --py-files ...` recipe); it must
never be committed stale.  If a zip is present on disk, every kgpipe/*.py
member must match the working-tree source byte-for-byte — a drifted zip
means the documented cluster path would run outdated code.
"""
from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_kgpipe_zip_matches_sources_if_present():
    zpath = REPO / "kgpipe.zip"
    if not zpath.exists():
        return  # nothing to check: the submit recipe builds it fresh
    with zipfile.ZipFile(zpath) as zf:
        names = [n for n in zf.namelist() if n.endswith(".py")]
        assert names, "kgpipe.zip contains no python members"
        for name in names:
            src = REPO / name
            assert src.exists(), f"{name} in zip but not in working tree"
            assert zf.read(name) == src.read_bytes(), (
                f"stale kgpipe.zip: {name} differs from working tree — "
                "regenerate with `zip -r kgpipe.zip kgpipe`"
            )
    # and every source module must be present in the zip
    for src in (REPO / "kgpipe").glob("*.py"):
        rel = f"kgpipe/{src.name}"
        assert rel in set(names), f"stale kgpipe.zip: missing {rel}"
