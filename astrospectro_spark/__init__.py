"""astrospectro_spark — a PySpark-native feature-engineering engine.

A from-scratch re-expression of the computation shape of
PhD-Brown/AstroSpectro (per-entity ordered-sequence featurization +
tolerance/nearest "as-of" joins + incremental ledger semantics) over
tables of multi-turn transcripts ``(conv_id, turn_idx, role, text,
tool, ts)``.

Not a port: the reference is an eager pandas/NumPy dataflow with
hand-rolled thread/process pools (reference:
src/pipeline/processing.py:27-46); this engine declares logical plans
with the DataFrame API and lets Catalyst/AQE pick physical strategy.

Modules
-------
- :mod:`astrospectro_spark.session`  — SparkSession factory, scale-aware confs
- :mod:`astrospectro_spark.synth`    — deterministic synthetic transcripts
- :mod:`astrospectro_spark.engine`   — windows, as-of join, featurize, skew, lineage
- :mod:`astrospectro_spark.functions`— text analysis, dedup, similarity, multimodal
- :mod:`astrospectro_spark.oracle`   — pure-pandas reference implementation
"""

__version__ = "0.1.0"
