"""Exactly-once epoch machinery: commit log, epoch apply, streaming driver."""
