"""Result artifact writing.

Semantically equivalent to LocationRegistration::WriteResults
(rrl/itkLocationRegistration.cxx:1874-2030): per query location a results
text file (final transform parameters in the reference ordering [A
row-major, t], parameter covariance, 8-d measurement vector, convergence
flags, the mapped query point) plus machine-readable JSON.
"""

from __future__ import annotations

import json

import numpy as np

import jax


def write_results(prefix: str, out, query_xyz) -> None:
    """Write `<prefix>.txt` and `<prefix>.json` for a LocationResult."""
    sel = int(out.selected)
    q = np.asarray(query_xyz, np.float64).tolist()

    rec = {
        "query": q,
        "selected": sel,
        "candidates": [],
    }
    C = out.probability.shape[0]
    for c in range(C):
        tr = jax.tree.map(lambda a: a[c], out.trans)
        rec["candidates"].append(
            {
                "params_reference_order": np.asarray(
                    tr.params_reference_order()
                ).tolist(),
                "center": np.asarray(tr.center).tolist(),
                "probability": float(out.probability[c]),
                "verified": bool(out.verified[c]),
                "converged": bool(out.converged[c]),
                "valid": bool(out.valid[c]),
                "oscillated": bool(out.oscillated[c]),
                "measurements": np.asarray(out.measurements[c]).tolist(),
                "query_mapped": np.asarray(out.query_mapped[c]).tolist(),
            }
        )

    with open(prefix + ".json", "w") as f:
        json.dump(rec, f, indent=1)

    lines = [f"query: {q[0]:.6f} {q[1]:.6f} {q[2]:.6f}", f"selected: {sel}"]
    if sel >= 0:
        tr = jax.tree.map(lambda a: a[sel], out.trans)
        p = np.asarray(tr.params_reference_order())
        cov = np.asarray(out.covar[sel])
        meas = np.asarray(out.measurements[sel])
        lines.append("transform (A row-major, t):")
        lines.append(" ".join(f"{v:.9g}" for v in p))
        lines.append("covariance:")
        for row in cov:
            lines.append(" ".join(f"{v:.6g}" for v in row))
        lines.append("measurements: " + " ".join(f"{v:.6g}" for v in meas))
        lines.append(f"probability: {float(out.probability[sel]):.6f}")
        lines.append(f"converged: {int(bool(out.converged[sel]))}")
        qm = np.asarray(out.query_mapped[sel])
        lines.append(f"query_mapped: {qm[0]:.6f} {qm[1]:.6f} {qm[2]:.6f}")
    with open(prefix + ".txt", "w") as f:
        f.write("\n".join(lines) + "\n")
