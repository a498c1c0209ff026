"""The oracle-convention linter must stay clean on the repo AND keep
catching each planted violation class (a linter that silently stops
matching is worse than none)."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_repo_is_lint_clean():
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint_oracles.py")],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout


def test_linter_catches_planted_violations(tmp_path):
    planted = REPO / "azure_medicine_data_engineering_spark" / "queries" / "_lint_selftest.py"
    planted.write_text(
        '''
from pyspark.sql import functions as F
BAD_EXPR = "round(x * 1.0 / n, 4)"
SQL = """SELECT ROUND(SUM(l_extendedprice), 2) AS s,
CAST(a * (a + 1) / 2 AS BIGINT) AS t FROM lineitem"""
def f(counts):
    return counts.crossJoin(counts.agg(F.sum("n")))
'''
    )
    try:
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "lint_oracles.py")],
            capture_output=True,
            text=True,
        )
        assert r.returncode == 1
        hits = [l for l in r.stdout.splitlines() if "_lint_selftest" in l]
        rules = {h.split(" R", 1)[1][0] for h in hits}
        assert rules == {"1", "2", "3", "4"}, r.stdout
    finally:
        planted.unlink()
