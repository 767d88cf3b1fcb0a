"""Multi-stream batching and multi-chip sharding (SURVEY.md sections 2.2 /
5.8): stream-data-parallel tracking over an ICI mesh, shared-gallery
all_gather, and sharded training steps."""
