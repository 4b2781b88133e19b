"""Print library / platform / device information.

Analogue of /root/reference/examples/info (dwt_util_print_info: version,
architecture, accel defaults); equivalent to ``python -m libdwt_tpu``.

    python examples/info.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import libdwt_tpu
    from libdwt_tpu.api import get_impl
    from libdwt_tpu.utils.perf import info

    print(f"libdwt_tpu {getattr(libdwt_tpu, '__version__', 'dev')}")
    for key, val in info().items():
        print(f"  {key}: {val}")
    print(f"  default impl: {get_impl()}")
    from libdwt_tpu.models.wavelets import REGISTRY

    print(f"  wavelets: {', '.join(sorted(REGISTRY))}")


if __name__ == "__main__":
    main()
