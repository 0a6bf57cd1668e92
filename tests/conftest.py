from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from astrospectro_spark.session import get_spark
from astrospectro_spark.synth import generate_anchors, generate_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="astrospectro_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf() -> pd.DataFrame:
    return generate_transcripts("sf0.001")


@pytest.fixture(scope="session")
def anchors_pdf(transcripts_pdf) -> pd.DataFrame:
    return generate_anchors(transcripts_pdf)


@pytest.fixture(scope="session")
def transcripts_sdf(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf)


@pytest.fixture(scope="session")
def anchors_sdf(spark, anchors_pdf):
    return spark.createDataFrame(anchors_pdf)


@pytest.fixture(scope="session")
def documents_sdf(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def assert_frames_match(
    got: pd.DataFrame,
    want: pd.DataFrame,
    sort_keys: list[str],
    rtol: float = 1e-9,
    atol: float = 1e-12,
):
    """allclose for floats, exact (incl. NULL mask) for everything else."""
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    g = got.sort_values(sort_keys, kind="mergesort").reset_index(drop=True)
    w = want.sort_values(sort_keys, kind="mergesort").reset_index(drop=True)
    for c in w.columns:
        assert c in g.columns, f"missing column {c}"
        a, b = g[c], w[c]
        if b.dtype.kind == "f" or a.dtype.kind == "f":
            assert np.allclose(
                a.to_numpy(dtype=float),
                b.to_numpy(dtype=float),
                rtol=rtol,
                atol=atol,
                equal_nan=True,
            ), f"float mismatch in {c}"
        else:
            av = a.astype(object).where(a.notna(), None)
            bv = b.astype(object).where(b.notna(), None)
            bad = [
                (x, y) for x, y in zip(av.tolist(), bv.tolist()) if x != y
            ]
            assert not bad, f"value mismatch in {c}: {bad[:5]}"
