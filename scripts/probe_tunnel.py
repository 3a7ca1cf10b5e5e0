"""Probe the remote-TPU tunnel: RTT, H2D and D2H bandwidth vs transfer size.

The e2e engine design lives or dies on these numbers (PERF.md measurement
methodology): every readback costs one RTT, and the device-traceback path
streams ~150 B/pair of move words back to the host.  Run on the real
backend; prints one JSON line per measurement.
"""

import json
import sys
import time

import numpy as np
import jax


def main():
    dev = jax.devices()[0]
    print(f"backend: {jax.default_backend()} {dev}", file=sys.stderr)
    tiny = jax.device_put(np.zeros(4, np.int32))
    np.asarray(tiny + 1)
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(tiny + 1)
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(json.dumps({"metric": "tunnel_rtt_ms",
                      "value": round(rtt * 1e3, 2),
                      "samples": [round(r * 1e3, 1) for r in rtts]}))

    for mb in (1, 4, 16, 64):
        arr = np.random.randint(0, 2**31, (mb * 1024 * 1024 // 4,),
                                dtype=np.int32)
        # H2D: device_put + tiny dependent readback forces completion
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        np.asarray(d[:1])
        h2d = time.perf_counter() - t0 - rtt
        # D2H warm: one full fetch
        t0 = time.perf_counter()
        back = np.asarray(d)
        d2h = time.perf_counter() - t0 - rtt
        assert back[0] == arr[0]
        # D2H with copy_to_host_async started first
        d2 = jax.device_put(arr)
        np.asarray(d2[:1])
        try:
            d2.copy_to_host_async()
            time.sleep(max(d2h * 0.9, 0.01))
            t0 = time.perf_counter()
            np.asarray(d2)
            d2h_async = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            d2h_async = None
            print(f"copy_to_host_async failed: {e}", file=sys.stderr)
        print(json.dumps({
            "metric": "tunnel_bw", "size_mb": mb,
            "h2d_mb_s": round(mb / max(h2d, 1e-9), 1),
            "d2h_mb_s": round(mb / max(d2h, 1e-9), 1),
            "d2h_after_async_s": (round(d2h_async, 4)
                                  if d2h_async is not None else None),
        }))


if __name__ == "__main__":
    main()
