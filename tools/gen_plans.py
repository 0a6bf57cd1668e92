"""Regenerate BENCH/PLANS.md — physical-plan evidence for the scale
properties the engine relies on (single exchange, pruning to the scan,
broadcast dims, no Python operators, id-only LSH band shuffle,
int-not-text featurize exchange)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from astrospectro_spark.session import get_spark  # noqa: E402


def formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def op_counts(plan: str) -> dict:
    ops = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    out: dict[str, int] = {}
    for o in ops:
        out[o] = out.get(o, 0) + 1
    return out


def tree(plan: str) -> str:
    return plan.split("== Physical Plan ==")[1].split("\n\n")[0]


def main() -> None:
    spark = get_spark(app_name="gen_plans", master="local[4]", shuffle_partitions=8)
    import astrospectro_spark.synth as synth

    syn = "/tmp/astrospectro_synth/plan"
    if not os.path.exists(os.path.join(syn, "transcripts.parquet")):
        synth.write_scale(syn, "sf0.001")
    turns = spark.read.parquet(os.path.join(syn, "transcripts.parquet"))
    anchors = spark.read.parquet(os.path.join(syn, "anchors.parquet"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    from astrospectro_spark.engine.asof import asof_join
    from astrospectro_spark.engine.windows import featurize_expr
    from astrospectro_spark.functions.dedup import minhash_lsh_candidates
    from astrospectro_spark.queries import q_broadcast_enrich, q_feature_vector_wide

    sections: list[tuple[str, str, list[str]]] = []

    def add(title, df, notes=()):
        p = formatted(spark, df)
        sections.append((title, p, list(notes)))

    add(
        "featurize_expr — full per-turn feature vector",
        featurize_expr(turns),
        ["ReadSchema: " + re.search(r"ReadSchema: ([^\n]*)", formatted(spark, featurize_expr(turns))).group(1)],
    )
    fe_ft = featurize_expr(turns, include_text=False)
    p = formatted(spark, fe_ft)
    ex_schema = ""
    m = re.search(r"^\(\d+\) Exchange\n(.*?)(?=^\(\d+\))", p, re.M | re.S)
    if m:
        arg = re.search(r"Input \[\d+\]: \[([^\]]*)\]", m.group(1))
        ex_schema = arg.group(1) if arg else ""
    sections.append(
        (
            "featurize_expr include_text=False — production shuffle payload",
            p,
            [
                "Exchange input columns: `" + ex_schema + "`",
                "`text` never reaches the exchange: the scan projects it to "
                "`text_len` (int) below the shuffle — at 10^12 turns the big "
                "exchange carries ~8 bytes/row of feature input instead of the corpus.",
            ],
        )
    )
    fe_en = featurize_expr(turns, include_text=False, enum_shuffle=True)
    p_en = formatted(spark, fe_en)
    en_schema = ""
    m = re.search(r"^\(\d+\) Exchange\n(.*?)(?=^\(\d+\))", p_en, re.M | re.S)
    if m:
        arg = re.search(r"Input \[\d+\]: \[([^\]]*)\]", m.group(1))
        en_schema = arg.group(1) if arg else ""
    sections.append(
        (
            "featurize_expr enum_shuffle=True — string-free shuffle rows",
            p_en,
            [
                "Exchange input columns: `" + en_schema + "`",
                "role/tool cross the exchange as 64-bit codes (`L` suffix); "
                "the only string in the shuffle row is the conv_id key. "
                "Decode = 3 broadcast joins against column-pruned distinct "
                "dims after the windows (no exchange added).",
            ],
        )
    )
    add(
        "featurize_expr wide=True — 163-feature wide tier, still ONE exchange",
        featurize_expr(turns, wide=True),
    )
    add(
        "featurize_expr projected to 2 columns (pruning check)",
        featurize_expr(turns).select("conv_id", "session_id"),
        [
            "ReadSchema: "
            + re.search(
                r"ReadSchema: ([^\n]*)",
                formatted(spark, featurize_expr(turns).select("conv_id", "session_id")),
            ).group(1)
        ],
    )
    add("asof_join — sorted-merge as-of", asof_join(turns, anchors, tolerance_col="tolerance_s"))
    add("broadcast_enrich — fact ⋈ two broadcast dims", q_broadcast_enrich(spark, "/root/testdata/sf0.001"))
    add(
        "feature_vector_wide — 183-column driver flagship",
        q_feature_vector_wide(spark, "/root/testdata/sf0.001"),
    )
    mh = minhash_lsh_candidates(docs)
    pmh = formatted(spark, mh)
    band_note = []
    for mm in re.finditer(r"^\(\d+\) Exchange\n(.*?)(?=^\(\d+\)|\Z)", pmh, re.M | re.S):
        if "band_hash" in mm.group(1):
            arg = re.search(r"Input \[\d+\]: \[([^\]]*)\]", mm.group(1))
            if arg:
                band_note.append("Band-bucket exchange input: `" + arg.group(1) + "` — ids only, no shingle arrays.")
    sections.append(("minhash_lsh_candidates — id-only band shuffle", pmh, band_note))

    from astrospectro_spark.jobs.curate_job import FUNNEL_STAGES, curate

    fun = (
        curate(docs, min_quality=0.3, min_tokens=2)
        .filter("keep")
        .drop(*FUNNEL_STAGES)
    )
    add(
        "curate funnel — dedup joins + expression filters, one output pass",
        fun,
        notes=(
            "Exact-dedup groupBy + LSH band join are the only shuffles; "
            "lang/quality/token verdicts are projections on the final scan.",
        ),
    )

    from astrospectro_spark.functions.similarity import embedding_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    add(
        "embedding_neardup_pairs — vectors never ride a sig exchange",
        embedding_neardup_pairs(emb),
        notes=(
            "Bucket self-join carries (table, sig, id); vectors re-attached "
            "to deduplicated pairs (locked by test_plan_shape).",
        ),
    )

    lines = [
        "# PLANS — physical-plan evidence (`.explain(\"formatted\")`)",
        "",
        "Checked properties: ONE hash exchange per entity-partitioned pipeline",
        "(all windows share partitionBy(conv_id), Catalyst reuses the exchange;",
        "extra Sorts are per-frame orderings, not shuffles), column pruning",
        "reaching the parquet scan (ReadSchema), broadcast joins for dims, zero",
        "Python operators in any plan, id-only LSH band shuffle, int-not-text",
        "featurize exchange. Regenerate: `python tools/gen_plans.py`.",
        "",
    ]
    for title, p, notes in sections:
        lines += [f"## {title}", "", f"Operator counts: `{op_counts(p)}`", "", "```"]
        lines += [tree(p).strip("\n"), "```", ""]
        for nte in notes:
            lines.append(f"- {nte}")
        if notes:
            lines.append("")
        assert "PythonUDF" not in p or "minhash" in title, title
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "BENCH", "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out)


if __name__ == "__main__":
    main()
