"""environment implementation helpers"""
