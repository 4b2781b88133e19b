"""Support layer: subband geometry, I/O, perf, fixed point, misc utils."""
