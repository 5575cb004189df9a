"""List known TPU targets + the detected one.

(Reference tools/get_available_targets.py listed TVM CUDA target tags.)
"""
from bitblas_tpu.tuner.arch import _BY_NAME, auto_detect_tpu_target

if __name__ == "__main__":
    names = sorted({d.name for d in _BY_NAME.values()})
    print("available targets:")
    for n in names:
        print(f"  {n}")
    print(f"detected: {auto_detect_tpu_target()}")
