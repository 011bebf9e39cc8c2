"""CLI entry point (C26 closure): ``python -m crawler_seo_spark``.

Mirrors the reference's argparse UX (main.py:231-341): validation errors
exit 1 before any engine work; a valid invocation crawls, prints a stats
JSON, and writes the report artifacts.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])


def _run(args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "crawler_seo_spark", *args],
        capture_output=True, text=True, timeout=timeout,
        cwd=REPO)


def test_invalid_url_exits_1():
    out = _run(["--url", "ftp://nope/", "--synthetic", "10"], timeout=60)
    assert out.returncode == 1
    assert "invalid seed URL" in out.stderr


def test_invalid_max_urls_exits_1():
    out = _run(["--max-urls", "0", "--synthetic", "10"], timeout=60)
    assert out.returncode == 1
    assert "max_urls" in out.stderr


def test_synthetic_quick_end_to_end(tmp_path):
    out = _run(["--synthetic", "60", "--max-urls", "25", "--quick",
                "--output", str(tmp_path), "--filename", "TEST",
                "--xlsx", "--cores", "4"])
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout[out.stdout.index("{"):])
    assert stats["urls_processed"] == 25
    assert stats["rounds"] >= 1
    report = tmp_path / "TEST"
    assert (report / "analise_completa").exists()
    assert (report / "resumo_executivo").exists()
    assert (report / "TEST.xlsx").exists()
