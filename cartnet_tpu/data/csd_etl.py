"""CSD -> graph ETL math (the licensed-API-free part).

The reference ETL (/root/reference/dataset/extract_csd_data.py) drives the
licensed CCDC ``ccdc`` API; reimplementing that access is out of scope
(SURVEY.md §2.3). What IS reproduced here is every piece of math the ETL
applies, so pre-extracted structures from any source can be converted into
training records with identical conventions:

  * ``frac_to_cart_matrix`` — cell parameters -> row-vector lattice matrix
    (extract_csd_data.py:15-25);
  * ``adp_cif_to_cart`` — ADP matrix conversion from CIF convention to
    Cartesian: U_cart = cellᵀ·(Nᵀ·U_cif·N)·cell with
    N = diag(‖(M⁻ᵀ)ᵢ‖) (extract_csd_data.py:115-123);
  * ``isotropic_adp`` — H-atom fallback U = u_iso·I (:92-100);
  * ``dedup_positions`` — duplicate-coordinate removal (:28-40);
  * ``structure_to_record`` — assemble a GraphRecord with the production
    radius graph (radius 5.0, uncapped — :135).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from cartnet_tpu.data.radius_graph import radius_graph_pbc


def frac_to_cart_matrix(a, b, c, alpha, beta, gamma) -> np.ndarray:
    """Lattice matrix (rows = lattice vectors) from cell params (degrees)."""
    al, be, ga = np.radians([alpha, beta, gamma])
    v = math.sqrt(1 - math.cos(al) ** 2 - math.cos(be) ** 2
                  - math.cos(ga) ** 2
                  + 2 * math.cos(al) * math.cos(be) * math.cos(ga))
    m = np.array([
        [a, b * math.cos(ga), c * math.cos(be)],
        [0, b * math.sin(ga),
         c * (math.cos(al) - math.cos(be) * math.cos(ga)) / math.sin(ga)],
        [0, 0, c * v / math.sin(ga)],
    ])
    return m.T  # rows are lattice vectors


def adp_cif_to_cart(u_cif: np.ndarray, cell: np.ndarray) -> np.ndarray:
    """CIF-convention ADP -> Cartesian: U_cart = Aᵀ·(Nᵀ·U_cif·N)·A.

    ``cell`` has lattice vectors as rows (A). N = diag of reciprocal-axis
    norms ‖(A⁻¹)ᵀ_i‖ — the standard U_cif -> U_cart transformation
    (extract_csd_data.py:115-123).
    """
    u_cif = np.asarray(u_cif, np.float64)
    cell = np.asarray(cell, np.float64)
    recip = np.linalg.inv(cell).T
    n = np.diag(np.linalg.norm(recip, axis=1))
    inner = n.T @ u_cif @ n if u_cif.ndim == 2 else np.einsum(
        "ij,njk,kl->nil", n.T, u_cif, n)
    if u_cif.ndim == 2:
        return cell.T @ inner @ cell
    return np.einsum("ij,njk,kl->nil", cell.T, inner, cell)


def isotropic_adp(u_iso: float) -> np.ndarray:
    """H atoms carry isotropic U = u_iso·I (default 0.01, :92-100)."""
    return u_iso * np.eye(3)


def dedup_positions(pos: np.ndarray, tol: float = 1e-4) -> np.ndarray:
    """Indices of unique atom positions (keep-first), mirroring
    delete_repeated (:28-40)."""
    keep = []
    seen: list = []
    for i, p in enumerate(pos):
        if not any(np.allclose(p, q, atol=tol) for q in seen):
            keep.append(i)
            seen.append(p)
    return np.asarray(keep, np.int64)


def structure_to_record(z: np.ndarray, pos: np.ndarray, cell: np.ndarray,
                        u_cart: np.ndarray, temperature: float,
                        radius: float = 5.0,
                        max_neighbors: Optional[int] = None) -> dict:
    """Assemble the canonical GraphRecord for one ADP structure."""
    src, dst, dist, cart_dir = radius_graph_pbc(pos, cell, radius,
                                                max_neighbors)
    return {"z": np.asarray(z, np.int32), "pos": np.asarray(pos, np.float32),
            "cell": np.asarray(cell, np.float32),
            "edge_src": src, "edge_dst": dst,
            "cart_dist": dist, "cart_dir": cart_dir,
            "y": np.asarray(u_cart, np.float32),
            "temperature": float(temperature)}
