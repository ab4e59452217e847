"""CLI layer — the reference's ``main.py`` + ``options/`` equivalents."""
