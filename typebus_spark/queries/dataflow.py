"""Filled in later rounds of this build."""
