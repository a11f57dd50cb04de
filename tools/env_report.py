"""Report which optional engine paths are active in the current environment
(round-3 verdict item 9: make requirements-optional.txt actionable).

Checks each optional dependency and prints ACTIVE / INACTIVE plus what
degrades. Exit code 0 always — this is a report, not a gate.

Usage: python tools/env_report.py
"""

from __future__ import annotations

import importlib.util


def have(mod: str) -> bool:
    try:
        return importlib.util.find_spec(mod) is not None
    except ModuleNotFoundError:  # missing parent package (e.g. google.*)
        return False


def main() -> None:
    rows = [
        (
            "protobuf",
            have("google.protobuf"),
            "streaming/transform.running_aggregate_tws (Spark 4 "
            "transformWithStateInPandas); without it the operator raises "
            "ImportError at plan time and its test import-skips. "
            "applyInPandasWithState (stateful_running_count) is unaffected.",
        ),
        (
            "PIL (pillow)",
            have("PIL"),
            "functions/multimodal.decode_real_image; without it the RAW1 "
            "toy codec exercises the full mapInPandas plumbing and the "
            "real-codec stage raises NotImplementedError.",
        ),
        (
            "soundfile",
            have("soundfile"),
            "functions/multimodal real audio decode; RAW1 fallback as above.",
        ),
        (
            "duckdb",
            have("duckdb"),
            "tools/check_oracle.py + tools/duckdb_bench.py (dev-only "
            "verification harness; the engine itself never imports it).",
        ),
    ]
    width = max(len(r[0]) for r in rows)
    for name, ok, what in rows:
        state = "ACTIVE  " if ok else "INACTIVE"
        print(f"{state} {name:<{width}}  {what}")
    import pyspark

    print(f"\npyspark {pyspark.__version__}")


if __name__ == "__main__":
    main()
