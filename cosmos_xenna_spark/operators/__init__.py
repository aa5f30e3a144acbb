"""Engine operators that go beyond single built-in DataFrame calls.

Composite relational operators (as-of join, bucketized range join),
the Stage pipeline API (reference-parity stateful batched map), and the
LLM-data operators (dedup, similarity, text, multimodal).
"""
