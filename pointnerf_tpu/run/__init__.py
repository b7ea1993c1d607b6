"""Experiment drivers (reference: run/)."""
