"""Renderer orchestration: camera, frame graph, history state."""
