"""Build the native geometry library: python -m dyn_res_pile_manip_tpu.native.build"""
import os
import subprocess
import sys


def build() -> bool:
    here = os.path.dirname(__file__)
    try:
        subprocess.run(["make", "-C", here], check=True,
                       capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print("native build failed:", getattr(e, "stderr", e),
              file=sys.stderr)
        return False


if __name__ == "__main__":
    ok = build()
    from . import available
    print("native geometry library:",
          "available" if available() else "NOT available")
    sys.exit(0 if ok else 1)
