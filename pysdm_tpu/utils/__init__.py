"""small shared utilities"""
