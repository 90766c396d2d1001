"""Sources: multi-format readers and multimodal (binary-payload) plumbing."""
