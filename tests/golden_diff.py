"""Dev helper: dump actual-vs-expected for reference golden cases.

Usage: python tests/golden_diff.py [File.test ...] [--max N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from quickstep_tpu import Database
from quickstep_tpu.utils.golden import outputs_match, parse_golden_file, run_case
from quickstep_tpu.utils.testdb import load_test_relation

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "reference")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_n = 999
    for a in sys.argv[1:]:
        if a.startswith("--max"):
            max_n = int(a.split("=")[1])
    files = args or sorted(f for f in os.listdir(HERE) if f.endswith(".test"))
    for fname in files:
        with open(os.path.join(HERE, fname)) as f:
            cases = parse_golden_file(f.read())
        db = Database()
        load_test_relation(db)
        shown = 0
        for i, case in enumerate(cases):
            try:
                actual = run_case(db, case)
            except Exception as e:  # noqa: BLE001
                actual = f"<EXCEPTION {type(e).__name__}: {e}>"
            if not outputs_match(actual, case.expected, case.sql):
                shown += 1
                if shown > max_n:
                    break
                print(f"##### {fname} case {i} (line {case.line})")
                print("--- sql ---")
                print(case.sql.rstrip())
                print("--- expected ---")
                print(case.expected.rstrip())
                print("--- actual ---")
                print(actual.rstrip())
                print()


if __name__ == "__main__":
    main()
