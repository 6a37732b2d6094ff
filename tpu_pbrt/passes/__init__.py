"""Render passes: path tracing, G-buffer, ReSTIR DI, SHARC, post-processing."""
