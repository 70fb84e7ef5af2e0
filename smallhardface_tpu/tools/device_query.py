"""Device inventory dump — the `caffe device_query` analog
(/root/reference/caffe/tools/caffe.cpp device_query brew).

Usage: python -m smallhardface_tpu.tools.device_query
"""

from __future__ import annotations


def main():
    import jax

    print(f"backend: {jax.default_backend()}")
    print(f"process: {jax.process_index()}/{jax.process_count()}")
    for d in jax.devices():
        mem = ""
        stats = None
        try:
            stats = d.memory_stats()
        except Exception:
            pass
        if stats:
            total = stats.get("bytes_limit", 0)
            used = stats.get("bytes_in_use", 0)
            mem = (f" mem {used / 2**30:.2f}/{total / 2**30:.2f} GiB")
        print(f"  [{d.id}] {d.device_kind} platform={d.platform} "
              f"process={d.process_index}{mem}")


if __name__ == "__main__":
    main()
