#!/usr/bin/env python
"""Reference-compatible launcher: ``python main.py [flags] {EXTRA,INTER} [flags]``
(same CLI surface as reference main.py + options/options.py)."""

from deep_video_interpolation_extrapolation_tpu.cli.main import main

if __name__ == "__main__":
    main()
