"""Sources & sinks: session factory, table IO, synthetic data, checkpointing."""
