"""Container format, native IO bindings, metrics, corpus discovery, config."""
