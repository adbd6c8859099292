"""Compile-time planning: expression translation, coercion, nested flatten."""
