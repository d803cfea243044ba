"""Pipeline-spec file loading (SURVEY §2.A1).

The reference parses its procedure-definition XML from HDFS or the
local filesystem (``OpContainer.java:226-262``,
``OpContainerTest.java:176-191``). The engine's spec is a plain dict;
this module loads it from JSON (and YAML when available) files — XML
was an accident of the reference, not a capability (SURVEY §2.A1).

Paths may carry any Hadoop-supported scheme (``hdfs://``, ``s3a://``,
``file://`` …): schemed paths are read through the active Spark
session's Hadoop FileSystem API, matching the reference's
FileSystem.get(...) spec loading; bare paths use the local filesystem
directly (no JVM needed).
"""

from __future__ import annotations

import json
import os


def _read_text(path: str) -> str:
    """Read a spec file as text, from the local FS or any
    Hadoop-supported scheme via the active SparkSession's JVM
    (``OpContainer.java:236-262``'s FileSystem path, re-expressed)."""
    if "://" not in path:
        with open(path) as fh:
            return fh.read()
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError(
            f"spec path {path!r} has a filesystem scheme; reading it "
            "requires an active SparkSession (Hadoop FileSystem API)"
        )
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    stream = fs.open(jpath)
    try:
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, conf, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def load_spec(path: str) -> dict:
    """Load a pipeline spec from a .json / .yaml / .yml file (local
    path or Hadoop scheme)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        return json.loads(_read_text(path))
    if ext in (".yaml", ".yml"):
        try:
            import yaml
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "YAML spec requires pyyaml; use JSON in this environment"
            ) from exc
        return yaml.safe_load(_read_text(path))
    raise ValueError(f"unsupported spec format: {path!r} (use .json/.yaml)")


def dump_spec(spec: dict, path: str) -> None:
    """Write a pipeline spec as JSON (round-trips with load_spec)."""
    with open(path, "w") as fh:
        json.dump(spec, fh, indent=2)


def load_reference_xml(path: str, op_attr: str = "class") -> dict:
    """Parse the reference's procedure-definition XML shape into a
    pipeline spec: ``<operator name=.. class=..>`` nodes
    (``OpContainer.java:333-345``) and ``<connect from="op.port"
    to="op.port"/>`` edges (``OpContainer.java:288-293,356-364``).

    The ``to`` port becomes the consumer's input-port name; per-operator
    ``<param name=.. value=..>`` children become ``params``. This gives
    drop-in parity for pipelines authored in the reference's format —
    only the operator class names must map to registry keys (or
    dotted-path plugins, the engine's Class.forName). Accepts local
    paths and Hadoop schemes, like the reference's HDFS spec loading.
    """
    import xml.etree.ElementTree as ET

    from streamingdemo_spark.operators.graph import SpecError

    root = ET.fromstring(_read_text(path))
    ops: dict[str, dict] = {}
    for op in root.iter("operator"):
        name = op.attrib["name"]
        ops[name] = {
            "name": name,
            "op": op.attrib.get(op_attr) or op.attrib.get("mainClass", ""),
            "params": {
                p.attrib["name"]: p.attrib["value"] for p in op.findall("param")
            },
            "inputs": {},
        }
    for edge in root.iter("connect"):
        src = edge.attrib["from"]
        dst_op, dst_port = edge.attrib["to"].split(".", 1)
        if dst_op not in ops:
            raise SpecError(f"<connect> references unknown operator {dst_op!r}")
        ops[dst_op]["inputs"][dst_port] = src
    return {"operators": list(ops.values())}
