"""Terminal progress bars (semantics of /root/reference/src/progress.h:
56-205): rate-limited repainting on stderr with count/total, unicode
block bar, rate and ETA; silent when stderr is not a terminal."""

from __future__ import annotations

import sys
import time

_BLOCKS = " ▏▎▍▌▋▊▉█"


class Progress:
    def __init__(
        self,
        desc: str,
        total: int | None = None,
        out=None,
        min_interval: float = 0.1,
        ascii_only: bool = False,
    ):
        self.desc = desc
        self.total = total
        self.count = 0
        self.out = out if out is not None else sys.stderr
        self.min_interval = min_interval
        self.ascii = ascii_only
        self._t0 = time.time()
        self._last = 0.0
        self._enabled = hasattr(self.out, "isatty") and self.out.isatty()
        self._width = 30

    def set_total(self, total: int) -> None:
        self.total = total

    def update(self, n: int = 1) -> None:
        self.count += n
        now = time.time()
        if self._enabled and now - self._last >= self.min_interval:
            self._last = now
            self._paint()

    def __iadd__(self, n: int) -> "Progress":
        self.update(n)
        return self

    def _bar(self, frac: float) -> str:
        if self.ascii:
            filled = int(frac * self._width)
            return "#" * filled + "-" * (self._width - filled)
        cells = frac * self._width
        full = int(cells)
        part = int((cells - full) * 8)
        bar = "█" * full
        if full < self._width and part:
            bar += _BLOCKS[part]
        return bar.ljust(self._width)

    def _paint(self) -> None:
        elapsed = time.time() - self._t0
        rate = self.count / elapsed if elapsed > 0 else 0.0
        if self.total:
            frac = min(1.0, self.count / self.total)
            eta = (self.total - self.count) / rate if rate > 0 else 0
            line = (
                f"{self.desc}: {frac*100:3.0f}%|{self._bar(frac)}| "
                f"{self.count}/{self.total} "
                f"[{elapsed:.0f}s<{eta:.0f}s, {rate:.1f}/s]"
            )
        else:
            line = (
                f"{self.desc}: {self.count} "
                f"[{elapsed:.0f}s, {rate:.1f}/s]"
            )
        self.out.write("\r\x1b[K" + line)
        self.out.flush()

    def close(self) -> None:
        if self._enabled:
            self._paint()
            self.out.write("\n")
            self.out.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
