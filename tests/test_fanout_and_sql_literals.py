"""Round-13 hardening tests: the fan_out partition-count gate (VERDICT r12
"what's wrong" #1 / next #3), non-finite SQL double literals, identifier
quoting in the string-path expression builders, and the directory-dataset
schema-cache key (ADVICE r12)."""

from __future__ import annotations

import math
import os
import time

import pytest
from pyspark.sql import functions as F


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


class TestFanOutGate:
    def test_narrow_scan_still_fans_out(self, spark, tmp_path):
        """Bench shape: a 1-split file repartitions to defaultParallelism."""
        from cruncher_spark.sources.tables import fan_out

        p = str(tmp_path / "narrow.parquet")
        spark.range(100).write.mode("overwrite").parquet(p)
        df = spark.read.parquet(p)
        out = fan_out(df)
        n = spark.sparkContext.defaultParallelism
        assert out.rdd.getNumPartitions() == n
        assert out.count() == 100

    def test_wide_input_skips_the_exchange(self, spark, tmp_path):
        """An input already at >= defaultParallelism partitions is returned
        AS-IS: no repartition node, no narrowing to defaultParallelism."""
        from cruncher_spark.sources.tables import fan_out

        n = spark.sparkContext.defaultParallelism
        wide = spark.range(1000).repartition(n * 4)
        out = fan_out(wide)
        assert out is wide  # identical handle — no plan node added
        assert out.rdd.getNumPartitions() == n * 4

    def test_explicit_parts_still_honored(self, spark):
        from cruncher_spark.sources.tables import fan_out

        df = spark.range(10).coalesce(1)
        assert fan_out(df, parts=4).rdd.getNumPartitions() == 4

    def test_memo_distinguishes_plan_shapes_over_same_file(
        self, spark, tmp_path
    ):
        """A union of two derivations of one file has 2x the scan's
        partitions; the memo must not serve the scan's count for it."""
        from cruncher_spark.sources import tables

        p = str(tmp_path / "u.parquet")
        spark.range(50).write.mode("overwrite").parquet(p)
        scan = spark.read.parquet(p)
        tables.fan_out(scan)  # seeds the memo for the plain scan
        before = len(tables._FAN_OUT_PARTS)
        union = scan.unionAll(scan.select((F.col("id") + 50).alias("id")))
        tables.fan_out(union)
        assert len(tables._FAN_OUT_PARTS) > before  # distinct memo entries
        # and a RE-READ of the same file hits the scan's existing entry
        tables.fan_out(spark.read.parquet(p))
        assert len(tables._FAN_OUT_PARTS) == before + 1


class TestSqlDoubleLiterals:
    def test_finite_round_trip(self, spark):
        from cruncher_spark.functions.scalars import sql_double

        vals = [0.0, -0.0, 1.5, -2.25, 1e-300, 1.7976931348623157e308, 0.1]
        row = spark.range(1).select(
            F.expr("array(" + ", ".join(sql_double(v) for v in vals) + ")")
        ).first()[0]
        assert row == vals

    def test_non_finite_parse_and_value(self, spark):
        from cruncher_spark.functions.scalars import sql_double

        inf, ninf, nan = (
            float("inf"),
            float("-inf"),
            float("nan"),
        )
        row = spark.range(1).select(
            F.expr(
                "array("
                + ", ".join(sql_double(v) for v in (inf, ninf, nan))
                + ")"
            )
        ).first()[0]
        assert row[0] == inf and row[1] == ninf and math.isnan(row[2])

    def test_w_lit_with_diverged_weights(self, spark):
        """ADVICE r12: _w_lit on inf/nan weights must parse (the old
        repr-only form emitted 'infD', an analysis error)."""
        from cruncher_spark.operators.classifier import _w_lit

        row = spark.range(1).select(
            _w_lit([1.0, float("inf"), float("nan")]).alias("w")
        ).first()["w"]
        assert row[0] == 1.0 and row[1] == float("inf") and math.isnan(row[2])


class TestIdentifierQuoting:
    def test_dot_norm_cosine_on_weird_names(self, spark):
        """ADVICE r12: string-path dot/norm/cosine broke on names with
        spaces/hyphens/reserved words; backtick quoting fixes them."""
        from cruncher_spark.operators.similarity import cosine, dot, norm

        df = spark.createDataFrame(
            [([1.0, 2.0], [3.0, 4.0])], ["my vec", "select"]
        )
        got = df.select(
            dot("my vec", "select").alias("d"),
            norm("my vec").alias("n"),
            cosine("my vec", "select").alias("c"),
        ).first()
        assert got["d"] == 11.0
        assert got["n"] == pytest.approx(math.sqrt(5.0))
        assert got["c"] == pytest.approx(11.0 / (math.sqrt(5) * 5.0))

    def test_lsh_bucket_rejects_column_clearly(self, spark):
        from cruncher_spark.operators.similarity import lsh_bucket

        with pytest.raises(TypeError, match="column NAME"):
            lsh_bucket(F.col("v"), dim=4)

    def test_sign_pattern_rejects_column_clearly(self):
        from cruncher_spark.operators.similarity import (
            _hyperplane_signs,
            _sign_pattern_cell,
            _sign_pattern_projs,
        )

        planes = _hyperplane_signs(4, 2)
        with pytest.raises(TypeError, match="column NAME"):
            _sign_pattern_cell(F.col("v"), planes)
        with pytest.raises(TypeError, match="column NAME"):
            _sign_pattern_projs(F.col("v"), planes)

    def test_lsh_bucket_quoted_name_matches_plain(self, spark):
        """Quoting a plain identifier must not change bucket values."""
        from cruncher_spark.operators.similarity import lsh_bucket

        df = spark.createDataFrame([([0.5, -0.25, 1.0, -1.0],)], ["emb"])
        b = df.select(lsh_bucket("emb", dim=4, n_planes=4).alias("b")).first()["b"]
        assert isinstance(b, int) and 0 <= b < 16


class TestDirSchemaCacheKey:
    def test_part_file_rewrite_changes_key(self, spark, tmp_path):
        """ADVICE r12: directory mtime/size don't track in-place part-file
        rewrites; the shallow-listing fingerprint must."""
        from cruncher_spark.sources.tables import _schema_cache_key

        d = tmp_path / "t.parquet"
        spark.range(10).select(F.col("id").alias("a")).write.mode(
            "overwrite"
        ).parquet(str(d))
        k1 = _schema_cache_key(str(d))
        assert k1 is not None
        # rewrite a part file in place (same name, new bytes/mtime)
        part = next(p for p in d.iterdir() if p.name.startswith("part-"))
        time.sleep(0.01)
        data = part.read_bytes()
        part.write_bytes(data)
        os.utime(part)
        k2 = _schema_cache_key(str(d))
        assert k2 != k1

    def test_partitioned_dir_not_cached(self, spark, tmp_path):
        from cruncher_spark.sources.tables import _schema_cache_key

        d = tmp_path / "p.parquet"
        spark.range(10).withColumn("k", F.col("id") % 2).write.mode(
            "overwrite"
        ).partitionBy("k").parquet(str(d))
        assert _schema_cache_key(str(d)) is None

    def test_single_file_key_unchanged_shape(self, tmp_path):
        from cruncher_spark.sources.tables import _schema_cache_key

        f = tmp_path / "one.bin"
        f.write_bytes(b"x" * 10)
        k = _schema_cache_key(str(f))
        assert k is not None and k[0] == str(f)


class TestPrefixProbeSkip:
    def test_parquet_row_count_exact(self, spark, tmp_path):
        from cruncher_spark.sources.tables import parquet_row_count

        p = str(tmp_path / "c.parquet")
        spark.range(1234).write.mode("overwrite").parquet(p)
        assert parquet_row_count(p) == 1234
        assert parquet_row_count(str(tmp_path / "missing.parquet")) is None

    def test_bound_skip_equals_probe_path(self, spark):
        """prefix_jaccard_pairs with a proving n_docs_bound must return
        the exact pair set of the probed form (the skip branch IS the
        probe's hot-empty branch)."""
        from cruncher_spark.operators.dedup import (
            prefix_jaccard_pairs,
            shingle_arrays,
        )

        rows = [
            (1, "a b c d e f g"),
            (2, "a b c d e f h"),
            (3, "x y z w v u t"),
            (4, "x y z w v u t"),
            (5, "p q r s only once here"),
        ]
        sh = shingle_arrays(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            3,
        )
        probed = sorted(
            map(tuple, prefix_jaccard_pairs(sh, "doc_id", 0.5).collect())
        )
        skipped = sorted(
            map(
                tuple,
                prefix_jaccard_pairs(
                    sh, "doc_id", 0.5, n_docs_bound=len(rows)
                ).collect(),
            )
        )
        assert probed == skipped and len(probed) > 0

    def test_bound_above_cap_still_probes(self, spark):
        """A bound larger than df_cap must NOT skip the guard (the hot
        branch routing still fires for genuinely hot shingles)."""
        from cruncher_spark.operators.dedup import (
            prefix_jaccard_pairs,
            shingle_arrays,
        )

        rows = [(i, f"hot shingle words tail{i} x{i} y{i}") for i in range(8)]
        sh = shingle_arrays(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            3,
        )
        # df_cap=2 forces 'hot shingle words' (df=8) through the hot branch
        guarded = sorted(
            map(
                tuple,
                prefix_jaccard_pairs(
                    sh, "doc_id", 0.2, df_cap=2, n_docs_bound=8
                ).collect(),
            )
        )
        default = sorted(
            map(
                tuple,
                prefix_jaccard_pairs(sh, "doc_id", 0.2, df_cap=2).collect(),
            )
        )
        assert guarded == default
