"""Layer-A container tests (SURVEY §5.4): graph validation + toposort
are pure Python; the pipeline-vs-direct equivalence test proves the
container composes to the same result as the flagship DataFrame query.
"""

from __future__ import annotations

import pytest

from streamingdemo_spark.operators import (
    CycleError,
    PipelineGraph,
    SpecError,
    run_pipeline,
)
from streamingdemo_spark.operators.container import OperatorError
from streamingdemo_spark.registry import QUERIES


def _spec(*ops):
    return {"operators": list(ops)}


class TestGraph:
    def test_topo_order_linear(self):
        g = PipelineGraph(
            _spec(
                {"name": "c", "op": "x", "inputs": {"in": "b.out"}},
                {"name": "a", "op": "x"},
                {"name": "b", "op": "x", "inputs": {"in": "a.out"}},
            )
        )
        assert g.order == ["a", "b", "c"]

    def test_topo_order_diamond(self):
        g = PipelineGraph(
            _spec(
                {"name": "src", "op": "x"},
                {"name": "l", "op": "x", "inputs": {"in": "src.out"}},
                {"name": "r", "op": "x", "inputs": {"in": "src.out"}},
                {"name": "sink", "op": "x", "inputs": {"a": "l.out", "b": "r.out"}},
            )
        )
        assert g.order[0] == "src" and g.order[-1] == "sink"

    def test_cycle_raises(self):
        # The reference would print and run the acyclic prefix
        # (OpContainer.java:207-210); we raise instead.
        with pytest.raises(CycleError):
            PipelineGraph(
                _spec(
                    {"name": "a", "op": "x", "inputs": {"in": "b.out"}},
                    {"name": "b", "op": "x", "inputs": {"in": "a.out"}},
                )
            )

    def test_self_loop_raises(self):
        with pytest.raises(CycleError):
            PipelineGraph(_spec({"name": "a", "op": "x", "inputs": {"in": "a.out"}}))

    def test_unknown_upstream_raises(self):
        with pytest.raises(SpecError):
            PipelineGraph(_spec({"name": "a", "op": "x", "inputs": {"in": "ghost.out"}}))

    def test_duplicate_name_raises(self):
        with pytest.raises(SpecError):
            PipelineGraph(_spec({"name": "a", "op": "x"}, {"name": "a", "op": "x"}))

    def test_bad_port_address_raises(self):
        with pytest.raises(SpecError):
            PipelineGraph(_spec({"name": "a", "op": "x", "inputs": {"in": "noport"}}))

    def test_empty_spec_raises(self):
        with pytest.raises(SpecError):
            PipelineGraph({"operators": []})


def flagship_pipeline_spec(sf_dir: str) -> dict:
    """The flagship Q3 query as a container pipeline — source ops swapped
    in for KafkaInput exactly as SURVEY §7.3 prescribes."""
    cutoff = "TIMESTAMP '1998-06-01 00:00:00'"
    return _spec(
        {"name": "cust", "op": "parquet_source",
         "params": {"path": f"{sf_dir}/customer.parquet"}},
        {"name": "ord", "op": "parquet_source",
         "params": {"path": f"{sf_dir}/orders.parquet"}},
        {"name": "li", "op": "parquet_source",
         "params": {"path": f"{sf_dir}/lineitem.parquet"}},
        {"name": "cust_f", "op": "filter",
         "params": {"condition": "c_mktsegment = 'BUILDING'"},
         "inputs": {"in": "cust.out"}},
        {"name": "ord_f", "op": "filter",
         "params": {"condition": f"o_orderdate < {cutoff}"},
         "inputs": {"in": "ord.out"}},
        {"name": "li_f", "op": "filter",
         "params": {"condition": f"l_shipdate > {cutoff}"},
         "inputs": {"in": "li.out"}},
        {"name": "j1", "op": "join",
         "params": {"on": "l_orderkey = o_orderkey"},
         "inputs": {"left": "li_f.out", "right": "ord_f.out"}},
        {"name": "j2", "op": "join",
         "params": {"on": "o_custkey = c_custkey", "broadcast_right": True},
         "inputs": {"left": "j1.out", "right": "cust_f.out"}},
        {"name": "rev", "op": "aggregate",
         "params": {
             "group_by": ["l_orderkey", "o_orderdate", "o_orderpriority"],
             "aggs": [
                 "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
                 "AS DECIMAL(38,4))) AS DOUBLE) AS revenue"
             ],
         },
         "inputs": {"in": "j2.out"}},
        {"name": "top", "op": "sql",
         "params": {"query": "SELECT l_orderkey AS o_orderkey, o_orderdate, "
                             "o_orderpriority, revenue FROM res "
                             "ORDER BY revenue DESC, o_orderkey LIMIT 10"},
         "inputs": {"res": "rev.out"}},
    )


class TestContainer:
    def test_pipeline_equals_direct_query(self, spark, sf_dir):
        """A-layer composition reproduces the C-layer flagship result."""
        ports = run_pipeline(spark, flagship_pipeline_spec(sf_dir))
        via_pipeline = ports["top.out"]
        direct = QUERIES["flagship_q3"](spark, sf_dir)
        got = [tuple(r) for r in via_pipeline.collect()]
        want = [tuple(r) for r in direct.collect()]
        assert got == want and len(got) > 0

    def test_query_operator_exposes_registry_keys(self, spark, sf_dir):
        """Any registered query key runs as a DAG node, composable with
        downstream operators (here: filter on the dedup output)."""
        spec = _spec(
            {
                "name": "dedup",
                "op": "query",
                "params": {"key": "ext_dedup_exact", "sf_dir": sf_dir},
            },
            {
                "name": "dups",
                "op": "filter",
                "params": {"condition": "n_copies >= 2"},
                "inputs": {"in": "dedup.out"},
            },
        )
        ports = run_pipeline(spark, spec)
        direct = QUERIES["ext_dedup_exact"](spark, sf_dir).filter(
            "n_copies >= 2"
        )
        assert ports["dups.out"].count() == direct.count() > 0

    def test_query_operator_unknown_key_raises(self, spark, sf_dir):
        import pytest as _pytest

        spec = _spec(
            {
                "name": "bad",
                "op": "query",
                "params": {"key": "no_such_key", "sf_dir": sf_dir},
            }
        )
        with _pytest.raises(Exception, match="no_such_key"):
            run_pipeline(spark, spec)

    def test_run_log_records_success(self, spark, sf_dir, tmp_path):
        import json

        log_file = tmp_path / "runlog.jsonl"
        run_pipeline(
            spark,
            flagship_pipeline_spec(sf_dir),
            job_id="flagship",
            log_path=str(log_file),
        )
        entries = [json.loads(l) for l in log_file.read_text().splitlines()]
        assert len(entries) == 10
        assert all(e["status"] == "success" for e in entries)

    def test_failing_operator_raises_with_log(self, spark, sf_dir):
        spec = _spec(
            {"name": "src", "op": "parquet_source",
             "params": {"path": f"{sf_dir}/region.parquet"}},
            {"name": "bad", "op": "filter",
             "params": {"condition": "no_such_column = 1"},
             "inputs": {"in": "src.out"}},
        )
        with pytest.raises(OperatorError) as exc_info:
            run_pipeline(spark, spec)
        assert exc_info.value.op_name == "bad"
        statuses = {e["operator"]: e["status"] for e in exc_info.value.log.entries}
        assert statuses == {"src": "success", "bad": "failed"}

    def test_plugin_resolution_by_dotted_path(self, spark, sf_dir):
        """importlib plugin loading — the engine's Class.forName
        (OpContainer.java:109-130)."""
        spec = _spec(
            {"name": "src",
             "op": "streamingdemo_spark.operators.builtin:parquet_source",
             "params": {"path": f"{sf_dir}/region.parquet"}},
        )
        ports = run_pipeline(spark, spec)
        assert ports["src.out"].count() == 5

    def test_plugin_outside_allowlist_is_refused(self, spark, sf_dir):
        """Dotted paths outside the allowlist must not import: a spec
        parsed from an untrusted file would otherwise get arbitrary
        import-time code execution (unrestricted Class.forName)."""
        spec = _spec(
            {"name": "evil", "op": "os:system", "params": {}},
        )
        with pytest.raises(OperatorError) as exc_info:
            run_pipeline(spark, spec)
        assert isinstance(exc_info.value.__cause__, PermissionError)

    def test_allow_plugin_prefix_opt_in(self):
        from streamingdemo_spark.operators.registry import OperatorRegistry

        reg = OperatorRegistry()
        with pytest.raises(PermissionError):
            reg.resolve("json:loads")
        reg.allow_plugin_prefix("json")
        assert reg.resolve("json:loads") is __import__("json").loads

    def test_plugin_prefix_respects_module_boundary(self):
        """Allowing "json" must admit "json" and "json.*" only — a
        module merely sharing the spelling ("jsonevil") stays blocked."""
        from streamingdemo_spark.operators.registry import OperatorRegistry

        reg = OperatorRegistry()
        reg.allow_plugin_prefix("json")
        assert reg.resolve("json.decoder:JSONDecoder") is not None
        with pytest.raises(PermissionError):
            reg.resolve("jsonevil:f")


class TestDBRegistry:
    """A6: operator registry loaded from a database table over real
    JDBC (reference: DBHelper.java:8-35, OpContainerTest.java:124-145).
    Uses the Derby embedded driver from Spark's own classpath; the
    reader call is identical for MySQL/Postgres."""

    DERBY = "org.apache.derby.jdbc.EmbeddedDriver"

    def test_pipeline_resolves_operator_from_jdbc_table(
        self, spark, sf_dir, tmp_path
    ):
        from streamingdemo_spark.operators.db_registry import (
            REGISTRY_SCHEMA,
            register_from_table,
            registry_table_from_jdbc,
        )
        from streamingdemo_spark.operators.registry import OperatorRegistry

        url = f"jdbc:derby:{tmp_path}/regdb;create=true"
        rows = [
            ("db_parquet_source",
             "streamingdemo_spark.operators.builtin:parquet_source"),
            ("db_evil", "os:system"),
        ]
        (
            spark.createDataFrame(rows, REGISTRY_SCHEMA)
            .write.format("jdbc")
            .option("url", url).option("dbtable", "op_registry")
            .option("driver", self.DERBY).mode("overwrite").save()
        )

        table = registry_table_from_jdbc(
            spark, url, "op_registry", driver=self.DERBY
        )
        reg = OperatorRegistry()
        names = register_from_table(reg, table)
        assert sorted(names) == ["db_evil", "db_parquet_source"]

        spec = _spec(
            {"name": "src", "op": "db_parquet_source",
             "params": {"path": f"{sf_dir}/region.parquet"}},
        )
        ports = run_pipeline(spark, spec, registry=reg)
        assert ports["src.out"].count() == 5

        # a table row pointing outside the allowlist must still be
        # refused at dispatch — DB write access is not code execution
        bad = _spec({"name": "evil", "op": "db_evil", "params": {}})
        with pytest.raises(OperatorError) as exc_info:
            run_pipeline(spark, bad, registry=reg)
        assert isinstance(exc_info.value.__cause__, PermissionError)


class TestSpecIO:
    def test_json_spec_roundtrip_and_run(self, spark, sf_dir, tmp_path):
        """A1: pipeline spec loaded from a file drives the container."""
        from streamingdemo_spark.operators.spec_io import dump_spec, load_spec

        spec_file = str(tmp_path / "flagship.json")
        dump_spec(flagship_pipeline_spec(sf_dir), spec_file)
        loaded = load_spec(spec_file)
        ports = run_pipeline(spark, loaded)
        assert ports["top.out"].count() == 10

    def test_schemed_path_reads_via_hadoop_fs(self, spark, sf_dir, tmp_path):
        """A1 remote-FS parity (OpContainer.java:236-262): a spec path
        with a filesystem scheme goes through the Hadoop FileSystem
        API of the active session. file:// exercises the exact same
        JVM code path hdfs:// / s3a:// would take, minus the cluster."""
        from streamingdemo_spark.operators.spec_io import (
            dump_spec,
            load_reference_xml,
            load_spec,
        )

        spec_file = str(tmp_path / "flagship.json")
        dump_spec(flagship_pipeline_spec(sf_dir), spec_file)
        loaded = load_spec("file://" + spec_file)
        assert loaded == load_spec(spec_file)

        xml_file = tmp_path / "procedure.xml"
        xml_file.write_text(
            """<?xml version="1.0"?>
            <procedure>
              <operator name="src" class="parquet_source">
                <param name="path" value="/data/events"/>
              </operator>
            </procedure>"""
        )
        via_scheme = load_reference_xml("file://" + str(xml_file))
        assert via_scheme == load_reference_xml(str(xml_file))
        assert via_scheme["operators"][0]["op"] == "parquet_source"

    def test_unsupported_format_raises(self, tmp_path):
        from streamingdemo_spark.operators.spec_io import load_spec

        bad = tmp_path / "spec.xml"
        bad.write_text("<operators/>")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            load_spec(str(bad))


class TestKafkaWire:
    """The B1/B2 wire format must round-trip losslessly — the exact
    serialization kafka_sink writes and kafka_source parses, proven
    without a broker via the kafka_loopback operator."""

    SCHEMA = "event_id long, ts timestamp, value double, note string"

    def test_wire_round_trip_is_lossless(self, spark):
        from streamingdemo_spark.operators.builtin import (
            _kafka_decode,
            _kafka_encode,
        )

        rows = [
            # sub-millisecond timestamp: to_json's DEFAULT format
            # truncates to ms — the pinned micros format must not
            (1, "2026-03-01 01:02:03.123456", 0.1 + 0.2, "plain"),
            # 17-significant-digit double and a negative exponent
            (2, "2026-03-01 00:00:00.000001", 1.7976931348623157e308, "big"),
            (3, "2026-12-31 23:59:59.999999", 5e-324, 'quotes " and \\'),
            (4, "2026-06-15 12:00:00", None, "unicodé 日本語 \U0001F600"),
            (5, "2026-06-15 12:00:00.5", -0.0, None),
        ]
        df = spark.createDataFrame(
            [(i, __import__("datetime").datetime.fromisoformat(ts), v, s)
             for i, ts, v, s in rows],
            self.SCHEMA,
        )
        back = _kafka_decode(_kafka_encode(df), self.SCHEMA)
        assert back.schema == df.schema
        got = sorted([tuple(r) for r in back.collect()])
        want = sorted([tuple(r) for r in df.collect()])
        assert got == want

    def test_loopback_operator_in_pipeline(self, spark, sf_dir, tmp_path):
        """kafka_loopback as a DAG node: batch events through
        serialize→parse equals the identity projection."""
        from streamingdemo_spark.io import load_tables

        # stage a micros-typed copy: the raw fixture file is
        # TIMESTAMP(NANOS), which parquet_source reads as long
        staged = str(tmp_path / "events")
        load_tables(spark, sf_dir, ("events",))["events"].write.parquet(staged)
        ports = run_pipeline(
            spark,
            _spec(
                {
                    "name": "src",
                    "op": "parquet_source",
                    "params": {"path": staged},
                },
                {
                    "name": "wire",
                    "op": "kafka_loopback",
                    # ts is timestamp_ntz on this path (load_tables'
                    # parquet flavor); the decode schema must declare
                    # the same flavor the producer serialized
                    "params": {
                        "schema": (
                            "event_id long, ts timestamp_ntz, user_id long, "
                            "event_type string, value double, props string"
                        )
                    },
                    "inputs": {"in": "src.out"},
                },
            ),
        )
        want = load_tables(spark, sf_dir, ("events",))["events"]
        got = sorted([tuple(r) for r in ports["wire.out"].collect()])
        assert got == sorted([tuple(r) for r in want.collect()])


class TestReferenceXML:
    def test_reference_shaped_xml_drives_container(self, spark, sf_dir, tmp_path):
        """A1 parity: the reference's own XML shape (operator nodes +
        connect edges, OpContainer.java:288-345) compiles and runs."""
        from streamingdemo_spark.operators.spec_io import load_reference_xml

        xml = f"""<?xml version="1.0"?>
        <procedure jobinstanceid="job-1">
          <operator name="kafkaInput" class="parquet_source">
            <param name="path" value="{sf_dir}/events.parquet"/>
          </operator>
          <operator name="addField" class="add_field">
            <param name="name" value="value_bucket"/>
            <param name="expr" value="CAST(FLOOR(value / 100) AS BIGINT)"/>
          </operator>
          <connect from="kafkaInput.out" to="addField.in"/>
        </procedure>
        """
        path = tmp_path / "procedure.xml"
        path.write_text(xml)
        spec = load_reference_xml(str(path))
        ports = run_pipeline(spark, spec)
        out = ports["addField.out"]
        assert "value_bucket" in out.columns
        assert out.count() == spark.read.parquet(f"{sf_dir}/events.parquet").count()


class TestExampleSpecs:
    """The shipped example specs must stay runnable and correct."""

    def _run_example(self, spark, sf_dir, fname):
        import os

        from streamingdemo_spark.operators.spec_io import (
            load_reference_xml,
            load_spec,
        )

        path = os.path.join(os.path.dirname(__file__), "..", "examples", fname)
        spec = (
            load_reference_xml(path)
            if fname.endswith(".xml")
            else load_spec(path)
        )

        def sub(node):
            if isinstance(node, str):
                return node.replace("{sf_dir}", sf_dir)
            if isinstance(node, dict):
                return {k: sub(v) for k, v in node.items()}
            if isinstance(node, list):
                return [sub(v) for v in node]
            return node

        return run_pipeline(spark, sub(spec))

    def test_xml_example_equals_flagship(self, spark, sf_dir):
        """A pipeline authored in the reference's XML format reproduces
        the flagship query — drop-in parity for reference users."""
        ports = self._run_example(spark, sf_dir, "flagship_q3.xml")
        got = [tuple(r) for r in ports["top.out"].collect()]
        want = [tuple(r) for r in QUERIES["flagship_q3"](spark, sf_dir).collect()]
        assert got == want and len(got) == 10

    def test_yaml_example_runs(self, spark, sf_dir):
        ports = self._run_example(spark, sf_dir, "curation_pipeline.yaml")
        rows = ports["report.out"].collect()
        assert len(rows) > 0
        assert {"source", "n_docs", "total_tokens"} == set(rows[0].asDict())

    def test_training_data_pipeline_example(self, spark, sf_dir):
        """The LLM data-prep example composes registry query nodes
        (dedup, surprisal) with container sql/filter/aggregate ops and
        yields a per-source token budget; survivors must not exceed
        the corpus and every budget row must carry positive tokens."""
        ports = self._run_example(spark, sf_dir, "training_data_pipeline.yaml")
        rows = ports["budget.out"].collect()
        assert len(rows) > 0
        assert {"source", "n_docs", "total_tokens", "avg_surprisal"} == set(
            rows[0].asDict()
        )
        n_docs_total = sum(r["n_docs"] for r in rows)
        corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert 0 < n_docs_total <= corpus
        assert all(r["total_tokens"] > 0 for r in rows)


    def test_domain_targeting_spec_concentrates_target_lang(
        self, spark, sf_dir
    ):
        """The DSIR example must actually target: composed through the
        container, the selected set's language mix must put 'en' (the
        target slice) in the majority, and the per-lang totals must
        reconcile with running the registry key directly."""
        ports = self._run_example(spark, sf_dir, "domain_targeting.yaml")
        rows = {r["lang"]: r for r in ports["mix.out"].collect()}
        assert rows
        en = rows.get("en")
        assert en is not None
        # targeting is directional on this near-shared-vocabulary
        # synthetic corpus: the selected set must over-represent the
        # target slice vs its corpus base rate, and 'en' must be the
        # largest selected language
        n_sel = sum(r["n_docs"] for r in rows.values())
        corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_en = corpus.filter("lang = 'en'").count()
        assert en["n_docs"] / n_sel > n_en / corpus.count()
        assert en["n_docs"] == max(r["n_docs"] for r in rows.values())
        direct = (
            QUERIES["ext_dsir_weights"](spark, sf_dir)
            .filter("selected")
            .count()
        )
        assert direct == sum(r["n_docs"] for r in rows.values())

    def test_ann_serving_eval_spec_reconciles(self, spark, sf_dir):
        """The ANN-eval example's report must reconcile with running
        the two registry keys directly: 10 approx results, and the
        exact-top-5 hit count matches a direct set intersection."""
        ports = self._run_example(spark, sf_dir, "ann_serving_eval.yaml")
        row = ports["report.out"].collect()[0]
        assert row["n_approx"] == 10
        approx = {
            r["vec_id"]
            for r in QUERIES["ext_sim_ivfpq_topk"](spark, sf_dir).collect()
        }
        exact7 = {
            r["vec_id"]
            for r in QUERIES["ext_sim_cosine_topk"](spark, sf_dir).collect()
            if r["q_id"] == 7
        }
        assert row["n_exact_hits"] == len(approx & exact7)

    def test_hybrid_search_spec_equals_direct_fusion(self, spark, sf_dir):
        """The hybrid-search spec's hit list must carry exactly the
        ext_sim_rrf ranking (same doc per rank), joined metadata must
        be consistent, and the language report must cover the hits."""
        ports = self._run_example(spark, sf_dir, "hybrid_search.yaml")
        hits = ports["hits.out"].collect()
        want = {
            r["rank"]: r["doc_id"]
            for r in QUERIES["ext_sim_rrf"](spark, sf_dir).collect()
        }
        assert {r["rank"]: r["doc_id"] for r in hits} == want
        mix = ports["mix.out"].collect()
        assert sum(r["n_hits"] for r in mix) == len(hits)

    def test_anomaly_monitor_spec_equals_direct_query(self, spark, sf_dir):
        """The anomaly-monitor spec (source → 3σ screen → filter →
        rollup) must equal the same computation composed directly:
        the container's port wiring and filter/aggregate ops add
        nothing and lose nothing; and every alerting series must
        conserve its alert count into the rollup."""
        ports = self._run_example(spark, sf_dir, "anomaly_monitor.yaml")
        got = {
            r["event_type"]: (r["n_alerts"], r["min_flagged"], r["max_flagged"])
            for r in ports["rollup.out"].collect()
        }
        spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
            "e"
        )
        direct = {
            r["event_type"]: (r["n_alerts"], r["min_flagged"], r["max_flagged"])
            for r in spark.sql(
                """
                WITH u AS (
                  SELECT event_id, event_type,
                         CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS x
                  FROM e
                ),
                win AS (
                  SELECT event_id, event_type, x,
                         COUNT(x) OVER w AS n,
                         COALESCE(SUM(x) OVER w, CAST(0 AS BIGINT)) AS su,
                         COALESCE(SUM(x * x) OVER w, CAST(0 AS BIGINT)) AS sq
                  FROM u
                  WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
                )
                SELECT event_type, COUNT(*) AS n_alerts,
                       MIN(CAST(x AS DOUBLE) / 10000.0) AS min_flagged,
                       MAX(CAST(x AS DOUBLE) / 10000.0) AS max_flagged
                FROM win
                WHERE n >= 12
                  AND (x * n - su) * (x * n - su) > 9 * (n * sq - su * su)
                GROUP BY event_type
                """
            ).collect()
        }
        assert got == direct and len(got) > 0
        # screen → filter conservation: the filtered relation's size
        # equals the rollup's alert total
        assert ports["alerts.out"].count() == sum(
            v[0] for v in got.values()
        )

    def test_quality_gate_spec_equals_direct_query(self, spark, sf_dir):
        """The Gopher-gate spec must conserve the corpus through its
        funnel (keep + drop = |documents|), keep exactly the docs the
        registry key flags gopher_ok, and the per-source budget must
        count exactly the survivors."""
        from streamingdemo_spark.registry import QUERIES

        ports = self._run_example(spark, sf_dir, "quality_gate_pipeline.yaml")
        funnel = {r["gopher_ok"]: r["n_docs"] for r in ports["funnel.out"].collect()}
        n_corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert sum(funnel.values()) == n_corpus
        direct_kept = (
            QUERIES["ext_quality_gopher_rules"](spark, sf_dir)
            .filter("gopher_ok")
            .count()
        )
        assert funnel[True] == direct_kept
        budget = ports["budget.out"].collect()
        assert sum(r["n_docs"] for r in budget) == direct_kept
        assert all(r["total_words"] > 0 for r in budget)

    def test_web_dedup_spec_equals_direct_query(self, spark, sf_dir):
        """The URL-dedup spec's duplication profile must equal the
        direct canonicalize → group → profile computation, and the
        profile must conserve the corpus: Σ n_copies·n_groups =
        |documents|."""
        ports = self._run_example(spark, sf_dir, "web_dedup_pipeline.yaml")
        got = {
            r["n_copies"]: r["n_groups"] for r in ports["profile.out"].collect()
        }
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs.createOrReplaceTempView("d")
        direct = {
            r["n_copies"]: r["n_groups"]
            for r in spark.sql(
                """
                WITH urls AS (
                  SELECT doc_id,
                         concat(CASE WHEN doc_id % 2 = 0 THEN 'https://'
                                     ELSE 'http://' END,
                                CASE WHEN doc_id % 3 = 0
                                     THEN 'WWW.Docs.Example.COM'
                                     ELSE 'docs.example.com' END,
                                '/articles/', CAST(doc_id DIV 7 AS STRING),
                                CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END,
                                CASE WHEN doc_id % 4 = 0
                                     THEN '?utm_source=feed&ref=rss'
                                     ELSE '' END) AS url
                  FROM d
                ),
                canon AS (
                  SELECT regexp_replace(regexp_replace(regexp_replace(
                           regexp_replace(lower(url), '^https?://', ''),
                           '^www\\\\.', ''),
                           '\\\\?(utm_[a-z]+|ref)=[^&]*(&(utm_[a-z]+|ref)=[^&]*)*$',
                           ''),
                           '/$', '') AS canonical_url
                  FROM urls
                ),
                survivors AS (
                  SELECT canonical_url, COUNT(*) AS n_copies
                  FROM canon GROUP BY canonical_url
                )
                SELECT n_copies, COUNT(*) AS n_groups
                FROM survivors GROUP BY n_copies
                """
            ).collect()
        }
        assert got == direct and len(got) > 0
        assert sum(k * v for k, v in got.items()) == docs.count()


    def test_embedding_audit_spec_reconciles(self, spark, sf_dir):
        """The embedding-audit example's report must reconcile field by
        field with running the three registry keys directly, and the
        CI must bracket sanely."""
        ports = self._run_example(spark, sf_dir, "embedding_audit.yaml")
        row = ports["report.out"].collect()[0]
        km = QUERIES["ext_cluster_kmeans"](spark, sf_dir).collect()
        assert row["n_live_clusters"] == sum(1 for r in km if r["n_vecs"] > 0)
        assert row["total_inertia"] == sum(r["inertia"] for r in km)
        ns = [r["n_vecs"] for r in km]
        assert row["cluster_spread"] == max(ns) - min(ns)
        kc = QUERIES["ext_coreset_kcenter"](spark, sf_dir).collect()
        last = max(kc, key=lambda r: r["sel_rank"])
        assert row["coverage_radius2"] == last["radius2"]
        ci = QUERIES["ext_bootstrap_ci"](spark, sf_dir).collect()[0]
        assert row["mean_len_lo"] == ci["boot_lo"]
        assert row["mean_len_hi"] == ci["boot_hi"]
        assert row["mean_len_lo"] <= row["mean_len_hi"]


class TestTpchReportSpec:
    def test_tpch_report_spec_equals_direct_queries(self, spark, sf_dir):
        """The report spec's growth port must carry exactly the
        win_yoy_growth rows, the region rollup must cover every
        nation-year exactly once, and the pricing port must equal
        flagship_q1 (operator composition adds nothing and loses
        nothing — A-layer wiring over C-layer operators)."""
        from tests.test_container import TestExampleSpecs

        ports = TestExampleSpecs._run_example(
            TestExampleSpecs(), spark, sf_dir, "tpch_report.yaml"
        )
        direct = {
            (r["nation"], r["o_year"]): r["revenue"]
            for r in QUERIES["win_yoy_growth"](spark, sf_dir).collect()
        }
        got = {
            (r["nation"], r["o_year"]): r["revenue"]
            for r in ports["growth.out"].collect()
        }
        assert got == direct
        trend = ports["region_trend.out"].collect()
        assert sum(r["n_nations"] for r in trend) == len(direct)
        import math
        assert math.isclose(
            sum(r["revenue"] for r in trend),
            sum(direct.values()),
            rel_tol=1e-9,
        )
        q1_direct = {
            (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
            for r in QUERIES["flagship_q1"](spark, sf_dir).collect()
        }
        q1_spec = {
            (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
            for r in ports["pricing.out"].collect()
        }
        assert q1_spec == q1_direct


class TestFeatureStoreSpec:
    def test_feature_store_spec_matches_direct_keys(self, spark, sf_dir):
        """Feature-store spec parity: the examples port must carry one
        row per purchase with exactly the PIT features, and the
        campaign summary must conserve total purchases against the
        attribution key."""
        ports = TestExampleSpecs._run_example(
            TestExampleSpecs(), spark, sf_dir, "feature_store.yaml"
        )
        direct = {
            r["event_id"]: (r["clicks_before"], r["micros_since_signup"])
            for r in QUERIES["ext_feature_pit_assembly"](spark, sf_dir).collect()
        }
        got = {
            r["event_id"]: (r["clicks_before"], r["micros_since_signup"])
            for r in ports["examples.out"].collect()
        }
        assert got == direct
        summary = ports["campaign_summary.out"].collect()[0]
        att = QUERIES["ext_attribution_last_touch"](spark, sf_dir).collect()
        assert summary["n_campaigns"] == len(att)
        assert summary["total_purchases"] == sum(r["n_purchases"] for r in att)
        assert summary["total_purchases"] == len(direct)



class TestLakehouseEtlSpec:
    def test_lakehouse_spec_matches_direct_keys(self, spark, sf_dir):
        """A-layer proof for the txn-log family: the lakehouse
        lifecycle (COW merge, compaction, Z-order, incremental MV,
        stream ETL) composed through the container must carry exactly
        the rows the registry keys produce directly, and the audit
        row's counts and integer-cent sums must reconcile field by
        field — operator composition adds nothing and loses nothing,
        even for operators that stage and mutate their own
        transactional tables internally."""
        ports = TestExampleSpecs._run_example(
            TestExampleSpecs(), spark, sf_dir, "lakehouse_etl.yaml"
        )

        def cents(rows):
            return sum(
                int(r["o_totalprice"] * 100 + 0.5) for r in rows
            )

        merged = ports["merged.out"].collect()
        direct_merged = QUERIES["snk_txn_log_merge"](spark, sf_dir).collect()
        assert {r["o_orderkey"] for r in merged} == {
            r["o_orderkey"] for r in direct_merged
        }
        assert cents(merged) == cents(direct_merged)

        audit = ports["audit.out"].collect()[0]
        assert audit["merged_rows"] == len(direct_merged)
        assert audit["merged_cents"] == cents(direct_merged)

        direct_compact = QUERIES["snk_txn_log_compact"](
            spark, sf_dir
        ).collect()
        assert audit["compacted_rows"] == len(direct_compact)
        assert audit["compacted_cents"] == cents(direct_compact)
        # compaction is physically-only: same logical table as merge's
        # staging source, so the full-table row count must agree
        assert audit["compacted_rows"] == audit["merged_rows"]

        direct_z = QUERIES["snk_txn_log_zorder"](spark, sf_dir).collect()
        assert audit["zorder_slice_rows"] == len(direct_z)

        direct_mv = QUERIES["snk_txn_log_incr_mv"](spark, sf_dir).collect()
        assert audit["mv_orders"] == sum(r["n_orders"] for r in direct_mv)
        assert audit["mv_cents"] == sum(r["sum_cents"] for r in direct_mv)

        direct_etl = QUERIES["snk_txn_log_pipeline"](
            spark, sf_dir
        ).collect()
        assert audit["etl_rows"] == len(direct_etl)
        assert audit["etl_statuses"] == 1  # the ETL filter keeps 'F' only
