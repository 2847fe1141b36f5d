"""Utility subsystems: timing, logging, numpy oracle."""
