"""Composed pipeline plans (parse -> enrich -> route -> aggregate)."""
