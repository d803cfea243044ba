"""Maintain COMPRESSION_FP.json — the zlib-version-keyed byte
fingerprint that upgrades ``ext_compression_ratio`` from "rows-only,
trust the run" to "rows-only, byte-pinned": the DEFLATE stream is
encoder-internal (no independent engine can replay it — the key's
FINAL CONTRACT), but for a FIXED zlib build the output is a pure
function of the corpus, so its sha256 can be pinned and any silent
drift (library upgrade, UDF edit, batch-shape change leaking into
results) fails the pytest gate instead of passing unnoticed.

Record: {"zlib_runtime": ..., "zlib_module": ..., "sf_dir": ...,
         "n_rows": N, "sha256": <canonical-output hash>}
Canonical form: rows sorted by doc_id, "doc_id,lang,raw_chars,
compress_ppk" CSV lines, no header.

Run after a DELIBERATE change to the key or a zlib upgrade:
    python tools/compression_fp.py          # regenerate
    python tools/compression_fp.py --check  # verify, write nothing

tests/test_extensions.py::test_compression_ratio_fingerprint_pinned
asserts the pin whenever the runtime zlib version matches the
recorded one (and skips loudly when it doesn't — regenerate then).
"""

from __future__ import annotations

import hashlib
import json
import sys
import zlib
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

OUT = ROOT / "COMPRESSION_FP.json"
SF_DIR = "/root/testdata/sf0.01"


def compute(spark) -> dict:
    import __spark_entry__  # noqa: F401 - populates the registry
    from streamingdemo_spark.registry import QUERIES

    rows = QUERIES["ext_compression_ratio"](spark, SF_DIR).collect()
    body = "\n".join(
        f"{r['doc_id']},{r['lang']},{r['raw_chars']},{r['compress_ppk']}"
        for r in sorted(rows, key=lambda r: r["doc_id"])
    )
    return {
        "zlib_runtime": zlib.ZLIB_RUNTIME_VERSION,
        "zlib_module": zlib.ZLIB_VERSION,
        "sf_dir": SF_DIR,
        "n_rows": len(rows),
        "sha256": hashlib.sha256(body.encode()).hexdigest(),
    }


def main() -> int:
    check = "--check" in sys.argv
    from streamingdemo_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rec = compute(spark)
    if check:
        if not OUT.exists():
            print("no COMPRESSION_FP.json — run without --check first")
            return 1
        old = json.load(open(OUT))
        if old == rec:
            print("fingerprint current")
            return 0
        print(f"DRIFT: recorded {old} vs computed {rec}")
        return 1
    OUT.write_text(json.dumps(rec, indent=1) + "\n")
    print(f"wrote {OUT}: {rec['n_rows']} rows, zlib {rec['zlib_runtime']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
