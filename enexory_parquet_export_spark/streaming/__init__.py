"""Structured Streaming surface: incremental CDC merge and stateful
change detection — the streaming restatement of the reference's
binlog-driven pipeline and replication watcher."""
