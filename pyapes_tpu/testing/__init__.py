"""Manufactured solutions for testing (reference ``pyapes/testing/``)."""
