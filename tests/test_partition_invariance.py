"""Determinism across physical plans (SURVEY.md §5): identical output
under different partition counts and input row orders — mirrors the
reference's seed-stability check (src/dimred/embedding.py:189-266)."""

from __future__ import annotations

from astrospectro_spark.engine.windows import featurize_expr

from .conftest import assert_frames_match

SORT = ["conv_id", "ts", "turn_idx"]


def test_output_invariant_to_shuffle_partitions(spark, transcripts_pdf):
    base = None
    for n in (1, 64):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            got = featurize_expr(spark.createDataFrame(transcripts_pdf)).toPandas()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
        if base is None:
            base = got
        else:
            assert_frames_match(got, base, SORT, rtol=0.0, atol=0.0)


def test_output_invariant_to_input_order(spark, transcripts_pdf):
    a = featurize_expr(spark.createDataFrame(transcripts_pdf)).toPandas()
    shuffled = transcripts_pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    b = featurize_expr(spark.createDataFrame(shuffled)).toPandas()
    assert_frames_match(b, a, SORT, rtol=0.0, atol=0.0)


def test_output_invariant_to_input_partitioning(spark, transcripts_pdf):
    sdf = spark.createDataFrame(transcripts_pdf)
    a = featurize_expr(sdf).toPandas()
    b = featurize_expr(sdf.repartition(17)).toPandas()
    assert_frames_match(b, a, SORT, rtol=0.0, atol=0.0)
