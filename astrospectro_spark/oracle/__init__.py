from .pandas_oracle import featurize_pdf, oracle_features, oracle_asof  # noqa: F401
