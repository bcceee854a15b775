"""Staged checkpoint/resume for the halo-model pipeline.

The reference's "Fisher flowdown" comment (hmvec/hmvec.py:50-64) describes a
C1 (cosmology) -> C2 (mass function) -> C3 (profiles/HOD) staging where only
downstream stages need recomputation when a parameter moves; it never
implements persistence.  Here any dict-of-arrays stage state round-trips
through a single .npz file, so expensive stages can be computed once (e.g.
on a big machine / with a CAMB table) and reloaded.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_stages(path: str, **arrays):
    """Save named arrays (jnp or np) to ``path`` (.npz)."""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_stages(path: str, as_jax: bool = True):
    """Load a stage checkpoint back as a dict (jnp arrays by default)."""
    with np.load(path) as data:
        out = {k: data[k] for k in data.files}
    if as_jax:
        out = {k: jnp.asarray(v) for k, v in out.items()}
    return out


def save_halo_model(hm, path: str):
    """Persist a HaloModel's computed stage state (C2 + profiles + HODs)."""
    arrays = {
        "zs": hm.zs, "ks": hm.ks, "ms": hm.ms,
        "Pzk": hm.Pzk, "sigma2": hm.sigma2, "nzm": hm.nzm, "bh": hm.bh,
    }
    for name, uk in hm.uk_profiles.items():
        arrays[f"uk__{name}"] = uk
    for name, uk2 in getattr(hm, "uk2_profiles", {}).items():
        arrays[f"uk2__{name}"] = uk2       # <u^2> of conc-scatter profiles
    for name, pk in hm.pk_profiles.items():
        arrays[f"pk__{name}"] = pk
    for name, cib in getattr(hm, "cib_tracers", {}).items():
        for field in ("fc", "fs", "us", "us2"):
            val = getattr(cib, field)
            if val is not None:
                arrays[f"cib__{name}__{field}"] = val
    for name, hod in hm.hods.items():
        for key in ("Nc", "Ns", "NsNsm1", "NcNs", "ngal", "bg"):
            arrays[f"hod__{name}__{key}"] = hod[key]
    save_stages(path, **arrays)


def restore_halo_model(hm, path: str):
    """Restore stage state saved by save_halo_model into ``hm`` in place.

    Grids must match; raises if they do not."""
    data = load_stages(path)
    for grid in ("zs", "ks", "ms"):
        if not np.allclose(np.asarray(data[grid]), np.asarray(getattr(hm, grid))):
            raise ValueError(f"checkpoint grid {grid!r} does not match model")
    hm.Pzk = data["Pzk"]
    hm.sigma2 = data["sigma2"]
    hm.nzm = data["nzm"]
    hm.bh = data["bh"]
    cib_fields: dict = {}
    for key, val in data.items():
        if key.startswith("uk2__"):
            hm.uk2_profiles[key[5:]] = val
        elif key.startswith("uk__"):
            hm.uk_profiles[key[4:]] = val
        elif key.startswith("pk__"):
            hm.pk_profiles[key[4:]] = val
        elif key.startswith("cib__"):
            _, name, field = key.split("__")
            cib_fields.setdefault(name, {})[field] = val
        elif key.startswith("hod__"):
            _, name, field = key.split("__")
            hod = hm.hods.setdefault(name, {"satellite_profile": "nfw",
                                            "central_profile": None})
            hod[field] = val
    if cib_fields:
        from ..models.power import CIBTracer
        for name, fields in cib_fields.items():
            hm.cib_tracers[name] = CIBTracer(**fields)
    return hm
