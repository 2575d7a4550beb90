"""Sources & sinks: corpus generator, Lance/Parquet IO, testdata readers."""
