"""Ray Data stages: batch transforms (stateless) and actor-pool classes."""
