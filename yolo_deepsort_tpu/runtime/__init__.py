"""Host-side runtime: video decode with prefetch, writers, display."""
