"""Print the queries() driver-window membership for the current (or
SPARK_GRAFT_ROUND-overridden) round — the audit tool for ROTATION.md's
standing rotation policy."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __spark_entry__ as E  # noqa: E402


def main():
    rnd = E._round_no()
    names = list(E.queries())
    w = E._DRIVER_WINDOW
    print(f"round {rnd}: {len(names)} queries, driver window = first {w}")
    print("-- inside window --")
    for i, n in enumerate(names[:w], 1):
        print(f"{i:3d}. {n}")
    print("-- outside window (verify_oracle.py-only this round) --")
    for n in names[w:]:
        print(f"  -  {n}")


if __name__ == "__main__":
    main()
