"""Print registered solvers (parity: latent_diffusion.py:1015-1018)."""

from cfgpp_tpu.solvers import list_solvers

if __name__ == "__main__":
    print(f"Possible SD solvers: {list_solvers('sd')}")
    print(f"Possible SDXL solvers: {list_solvers('sdxl')}")
