"""End-to-end pipeline assembly (DAG + checkpoints + metrics)."""
