#!/usr/bin/env python
"""Run a container pipeline spec (JSON / YAML / reference-shape XML).

Usage::

    python examples/run_pipeline.py examples/curation_pipeline.yaml \
        --sf-dir /root/testdata/sf0.01 --show report.out

``{sf_dir}`` tokens inside string params are substituted with the
--sf-dir value, so one spec runs at any scale factor.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import streamingdemo_spark.extensions  # noqa: F401  (registers query keys
import streamingdemo_spark.plans  # noqa: F401       for the `query` op)
import streamingdemo_spark.streaming.queries  # noqa: F401
from streamingdemo_spark.operators import run_pipeline
from streamingdemo_spark.operators.spec_io import load_reference_xml, load_spec
from streamingdemo_spark.session import get_spark


def _substitute(node, sf_dir: str):
    if isinstance(node, str):
        return node.replace("{sf_dir}", sf_dir)
    if isinstance(node, dict):
        return {k: _substitute(v, sf_dir) for k, v in node.items()}
    if isinstance(node, list):
        return [_substitute(v, sf_dir) for v in node]
    return node


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("spec", help="pipeline spec (.json/.yaml/.yml/.xml)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--show",
        default=None,
        help="output port to display (default: every terminal port)",
    )
    args = ap.parse_args()

    if args.spec.lower().endswith(".xml"):
        spec = load_reference_xml(args.spec)
    else:
        spec = load_spec(args.spec)
    spec = _substitute(spec, args.sf_dir)

    spark = get_spark(app_name="pipeline-example")
    ports = run_pipeline(spark, spec)

    if args.show:
        targets = [args.show]
    else:
        consumed = {
            src
            for op in spec["operators"]
            for src in (op.get("inputs") or {}).values()
        }
        targets = [p for p in ports if p not in consumed]
    for port in targets:
        print(f"== {port} ==")
        ports[port].show(20, truncate=False)


if __name__ == "__main__":
    main()
