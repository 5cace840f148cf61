"""Sinks: file formats, console (human + machine), Redis Streams."""
