"""Headline benchmark: tracking-step throughput per chip.

Runs the flagship jitted per-frame compute (ORB extract at 1000 features on
640x480 + projection-gated matching against 2048 map points + motion-only
LM pose optimization — the reference's per-frame hot path, SURVEY §3.2) and
reports frames/s on the current accelerator.

Baseline: the reference tracks at ~30 Hz (mean 22-35 ms/frame @1000
features) on an i7-4790 (BASELINE.md). vs_baseline = fps / 30.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(fn)

    # Move static inputs to device once; the image is re-fed per frame like a
    # real camera stream (host->device transfer included in the measurement).
    img_host = np.asarray(args[0])
    dev_args = [jax.device_put(a) for a in args[1:]]

    # Warmup / compile.
    out = jfn(img_host, *dev_args)
    jax.block_until_ready(out)

    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(img_host, *dev_args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n / dt

    print(
        json.dumps(
            {
                "metric": "tracking_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
