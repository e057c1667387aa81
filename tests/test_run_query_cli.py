"""jobs/run_query.py CLI surface (Ray-free paths only: the execution
path is the same queries() registry the oracle checker drives)."""

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv):
    return subprocess.run([sys.executable,
                           os.path.join(_ROOT, "jobs", "run_query.py"),
                           *argv],
                          capture_output=True, text=True, cwd=_ROOT,
                          timeout=120)


def test_list_names_matches_registry():
    r = _run("--list")
    assert r.returncode == 0, r.stderr
    names = set(r.stdout.split())
    # a few load-bearing names must be present
    assert {"flagship", "bpe_train", "video_frames",
            "cms_counters"} <= names
    assert len(names) >= 96


def test_unknown_name_fails_cleanly():
    r = _run("definitely_not_a_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr
