"""Utility modules: profiling, debug aids."""
