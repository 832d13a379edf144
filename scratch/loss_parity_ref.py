"""Loss-model A/B: our physics/losses.py vs the REFERENCE's own code.

Imports /root/reference/losses.py directly (it only needs numpy; its
`from config import PhotonicLanternDesignParameters` is satisfied by
injecting OUR reconstruction of that class — the reference snapshot
itself lacks it, SURVEY.md §0.1) and feeds both stacks IDENTICAL
synthetic vectorial mode populations + the same MCFGeometry. Field-by-
field comparison of IL/MDL/PDL/XT for mux and demux.

This is the distribution-parity keystone: if the loss models agree on
identical modes, any dataset-range difference is attributable to the
SOLVER's mode statistics (confinement, PDL, n_eff spread), not to the
loss arithmetic.

Run: python scratch/loss_parity_ref.py   (CPU, seconds)
"""
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import pl_fem_tpu.config as plcfg
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.physics import LossCalculator as OurLC

# satisfy the reference's lazy `from config import ...` with our
# reconstruction (built from the authoritative call site it serves,
# /root/reference/losses.py:956-988)
fake_cfg = types.ModuleType("config")
fake_cfg.PhotonicLanternDesignParameters = \
    plcfg.PhotonicLanternDesignParameters
sys.modules["config"] = fake_cfg
sys.path.insert(0, "/root/reference")
import losses as ref_losses  # noqa: E402


def synth_modes(n_modes, conf_lo, conf_hi, seed, n_dofs=400):
    rng = np.random.default_rng(seed)
    k0 = 2 * np.pi / 1.55
    modes = []
    for i in range(n_modes):
        conf = float(conf_lo + (conf_hi - conf_lo) * rng.random())
        ne = float(1.30 + 0.2 * rng.random())
        px = float(0.4 + 0.4 * rng.random())
        py = float(0.4 + 0.4 * rng.random())
        ex = rng.standard_normal(n_dofs)
        ey = rng.standard_normal(n_dofs)
        # orthogonal-ish family with controlled overlap
        modes.append({
            "n_eff": ne, "beta": ne * k0,
            "beta_im": float(1e-9 * rng.random()),
            "P_x": px, "P_y": py,
            "PDL_dB": float(10 * np.log10(max(px, py) / min(px, py))),
            "polarization": "Hybrid",
            "confinement": conf, "core_overlap": conf,
            "div_ratio": 1e-5,
            "Ex_dofs": ex / np.linalg.norm(ex),
            "Ey_dofs": ey / np.linalg.norm(ey),
            "is_vectorial": True,
            "method": "synthetic",
        })
    modes.sort(key=lambda m: -m["n_eff"])
    return modes


def compare(tag, modes, geom, wl=1550.0):
    print(f"\n=== {tag} ({len(modes)} modes, conf "
          f"{min(m['confinement'] for m in modes):.3f}-"
          f"{max(m['confinement'] for m in modes):.3f}) ===")
    for direction in ("mux", "demux"):
        ours = OurLC.calculate_physical_losses(modes, geom, direction, wl)
        ref = ref_losses.LossCalculator.calculate_physical_losses(
            modes, geom, direction, wl)
        keys = sorted(set(ours) & set(ref))
        print(f"-- {direction}: ref success={ref.get('success')} "
              f"ours success={ours.get('success')}")
        for k in keys:
            a, b = ours.get(k), ref.get(k)
            if isinstance(a, (int, float)) and isinstance(b, (int, float)):
                d = abs(float(a) - float(b))
                flag = "" if d < 5e-3 else "   <-- DIFF"
                print(f"   {k:28s} ours={float(a):10.4f} "
                      f"ref={float(b):10.4f}{flag}")
        only_ref = sorted(set(ref) - set(ours))
        only_ours = sorted(set(ours) - set(ref))
        if only_ref:
            print(f"   keys only in ref:  {only_ref}")
        if only_ours:
            print(f"   keys only in ours: {only_ours}")


geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55,
                   taper_length_um=375.0)
compare("air-clad high confinement", synth_modes(18, 0.97, 0.999, 0), geom)
compare("mid confinement", synth_modes(10, 0.80, 0.95, 1), geom)
compare("low confinement / few modes", synth_modes(4, 0.55, 0.75, 2), geom)
