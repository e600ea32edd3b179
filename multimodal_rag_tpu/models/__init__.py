"""Encoders (MiniLM/CLIP-class) and LLM adapters."""
