"""Stdout/stderr tee to <output_dir>/output.log (reference
src/v1t/utils/logger.py:6-43), filtering carriage-return progress lines."""

from __future__ import annotations

import os
import sys
import typing as t


class _Tee:
    def __init__(self, stream: t.TextIO, file: t.TextIO):
        self.stream = stream
        self.file = file

    def write(self, data: str):
        self.stream.write(data)
        # drop tqdm-style carriage-return redraws from the log file
        if "\r" not in data:
            self.file.write(data)
            self.file.flush()

    def flush(self):
        self.stream.flush()
        self.file.flush()

    def isatty(self):
        return getattr(self.stream, "isatty", lambda: False)()


class Logger:
    def __init__(self, output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        self.file = open(os.path.join(output_dir, "output.log"), "a")
        sys.stdout = _Tee(sys.__stdout__, self.file)
        sys.stderr = _Tee(sys.__stderr__, self.file)

    def close(self):
        sys.stdout = sys.__stdout__
        sys.stderr = sys.__stderr__
        self.file.close()
