"""Multi-chip / multi-host layer: meshes, shard_map data parallelism, gather."""
