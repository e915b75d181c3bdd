"""Eval experiment specs: each module's ``main()`` returns a list of
``NetworkParam`` (reference ``evaluation/synburst/experiments`` contract).
"""
