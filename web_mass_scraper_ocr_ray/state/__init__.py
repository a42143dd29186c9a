"""Lineage, checkpoint and resume state (replaces the Postgres state machine)."""
