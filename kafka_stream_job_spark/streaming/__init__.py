"""Structured Streaming surface: event-time windows, watermarks, stateful
dedup, stream-static joins — the streaming semantics the category demands
beyond the reference's stateless map (SURVEY.md §7.3 step 3)."""
