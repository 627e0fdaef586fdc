"""Test stand-ins that must be importable on Spark executor workers."""
