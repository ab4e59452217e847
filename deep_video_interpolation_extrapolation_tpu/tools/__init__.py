"""Offline data tooling (reference create_vid_file.py, flow_process.py)."""
