"""Lattice geometry: unit cells, finite lattices, neighbor tables.

Host-side (numpy) preprocessing layer. Everything here is computed once at
model-construction time and baked into jitted programs as static constants.

Capability parity with the reference (``UnitCells.jl``, ``Lattices.jl``):
unit cell with lattice/reciprocal/basis vectors (UnitCells.jl:10-54),
Monkhorst-Pack mesh (UnitCells.jl:124-140), finite ``L1×L2×L3`` lattice of
cells with periodic boundaries, site↔cell↔orbit maps (Lattices.jl:16-109),
neighbor-table construction per ``(o1, o2, ΔL)`` bond rule with duplicate
removal (Lattices.jl:265-316), and the canonical neighbor-table sort
(Lattices.jl:323-340). All indices are 0-based.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class UnitCell:
    """Lattice geometry of a unit cell.

    Parameters mirror the reference ``UnitCell`` (UnitCells.jl:10-54):
    ``lvecs``/``bvecs`` may be given with fewer than 3 rows/cols; they are
    embedded into 3D (lattice vectors padded with the identity).
    """

    ndim: int
    norbits: int
    lvecs: np.ndarray  # (3, 3), columns are lattice vectors
    rlvecs: np.ndarray  # (3, 3), columns are reciprocal lattice vectors
    bvecs: np.ndarray  # (3, norbits), columns are basis vectors

    @staticmethod
    def create(ndim: int, norbits: int, lattice_vectors, basis_vectors) -> "UnitCell":
        # input convention: a list of lattice vectors (as parsed from TOML);
        # stored columns-are-vectors, embedded in 3D padded with the identity
        lv = np.eye(3)
        for i, vec in enumerate(np.atleast_2d(np.asarray(lattice_vectors, dtype=np.float64))):
            lv[: len(vec), i] = vec
        rlv = 2.0 * np.pi * np.linalg.inv(lv)
        bv = np.zeros((3, norbits))
        for i, vec in enumerate(np.atleast_2d(np.asarray(basis_vectors, dtype=np.float64))):
            bv[: len(vec), i] = vec
        return UnitCell(ndim=ndim, norbits=norbits, lvecs=lv, rlvecs=rlv, bvecs=bv)

    def cell_pos(self, l1: int, l2: int = 0, l3: int = 0) -> np.ndarray:
        """Real-space position of unit cell (l1,l2,l3) (UnitCells.jl:80-95)."""
        return l1 * self.lvecs[:, 0] + l2 * self.lvecs[:, 1] + l3 * self.lvecs[:, 2]

    def site_pos(self, orbit: int, l1: int, l2: int = 0, l3: int = 0) -> np.ndarray:
        """Real-space position of a site (UnitCells.jl:101-116)."""
        return self.cell_pos(l1, l2, l3) + self.bvecs[:, orbit]

    def monkhorst_pack_mesh(self, L1: int, L2: int = 1, L3: int = 1) -> np.ndarray:
        """(3, L1*L2*L3) k-point mesh over the Brillouin zone (UnitCells.jl:124-140)."""
        v1, v2, v3 = self.rlvecs[:, 0], self.rlvecs[:, 1], self.rlvecs[:, 2]
        ks = []
        for l3 in range(L3):
            for l2 in range(L2):
                for l1 in range(L1):
                    ks.append((l1 / L1) * v1 + (l2 / L2) * v2 + (l3 / L3) * v3)
        return np.stack(ks, axis=1)


@dataclass(frozen=True)
class Lattice:
    """A finite L1×L2×L3 lattice of unit cells with periodic boundaries.

    Site ordering matches the reference (Lattices.jl:83-104): orbit is the
    fastest index, then l1, then l2, then l3 — ``site = cell*norbits + orbit``
    with ``cell = l1 + L1*(l2 + L2*l3)`` (0-based).
    """

    unit_cell: UnitCell
    L1: int
    L2: int
    L3: int
    nsites: int
    ncells: int
    cell_loc: np.ndarray  # (3, ncells) int
    site_to_orbit: np.ndarray  # (nsites,) int
    site_to_cell: np.ndarray  # (nsites,) int

    @staticmethod
    def create(unit_cell: UnitCell, L1: int, L2: int | None = None, L3: int | None = None) -> "Lattice":
        # replicate the reference's dimension-defaulting (Lattices.jl:115-134)
        if L2 is None:
            L2 = L1 if unit_cell.ndim >= 2 else 1
        if L3 is None:
            L3 = L1 if unit_cell.ndim >= 3 else 1
        assert L1 >= 1 and L2 >= 1 and L3 >= 1
        ncells = L1 * L2 * L3
        norbits = unit_cell.norbits
        nsites = ncells * norbits

        cell_loc = np.zeros((3, ncells), dtype=np.int64)
        site_to_orbit = np.zeros(nsites, dtype=np.int64)
        site_to_cell = np.zeros(nsites, dtype=np.int64)
        site = 0
        cell = 0
        for l3 in range(L3):
            for l2 in range(L2):
                for l1 in range(L1):
                    cell_loc[:, cell] = (l1, l2, l3)
                    for orbit in range(norbits):
                        site_to_orbit[site] = orbit
                        site_to_cell[site] = cell
                        site += 1
                    cell += 1
        return Lattice(unit_cell, L1, L2, L3, nsites, ncells, cell_loc, site_to_orbit, site_to_cell)

    # -- index maps ---------------------------------------------------------

    @property
    def dims(self) -> tuple[int, int, int]:
        return (self.L1, self.L2, self.L3)

    def loc_to_cell(self, l1: int, l2: int = 0, l3: int = 0) -> int:
        """Periodic (l1,l2,l3) -> cell index (Lattices.jl:149-153)."""
        l1 %= self.L1
        l2 %= self.L2
        l3 %= self.L3
        return l1 + l2 * self.L1 + l3 * self.L1 * self.L2

    def loc_to_site(self, orbit: int, l1: int, l2: int = 0, l3: int = 0) -> int:
        """Periodic (orbit,l1,l2,l3) -> site index (Lattices.jl:164-168)."""
        return self.unit_cell.norbits * self.loc_to_cell(l1, l2, l3) + orbit

    def site_to_site(self, isite: int, displacement, orbit: int) -> int:
        """Site after a unit-cell displacement (Lattices.jl:176-191)."""
        cell = self.site_to_cell[isite]
        l1, l2, l3 = self.cell_loc[:, cell]
        return self.loc_to_site(orbit, l1 + displacement[0], l2 + displacement[1], l3 + displacement[2])

    # -- neighbor tables ----------------------------------------------------

    def calc_neighbor_table(self, orbit1: int, orbit2: int, displacement, remove_duplicates: bool = True) -> np.ndarray:
        """Neighbor table (2, Npairs) for a bond rule (Lattices.jl:265-316).

        One pair per unit cell: site of ``orbit1`` in the cell paired with the
        site of ``orbit2`` displaced by ``displacement`` unit cells.
        """
        norbits = self.unit_cell.norbits
        assert 0 <= orbit1 < norbits and 0 <= orbit2 < norbits
        pairs = []
        for isite in range(orbit1, self.nsites, norbits):
            fsite = self.site_to_site(isite, displacement, orbit2)
            pairs.append((isite, fsite))
        table = np.array(pairs, dtype=np.int64).T.reshape(2, -1)
        if remove_duplicates:
            from elphdynamics_tpu import native

            keep = native.dedup_pairs(table[0], table[1])
            if keep is None:
                keep = np.ones(table.shape[1], dtype=bool)
                for i in range(table.shape[1] - 1):
                    if not keep[i]:
                        continue
                    a, b = table[0, i], table[1, i]
                    for j in range(i + 1, table.shape[1]):
                        c, d = table[0, j], table[1, j]
                        if (a == c and b == d) or (a == d and b == c):
                            keep[j] = False
            table = table[:, keep]
        return table

    def site_displacement(self, site1: int, site2: int) -> np.ndarray:
        """Minimum-image displacement vector site1->site2 (Lattices.jl:347-366)."""
        vec = np.zeros(3)
        uc = self.unit_cell
        for d in range(3):
            L = self.dims[d]
            c1 = self.site_to_cell[site1]
            c2 = self.site_to_cell[site2]
            delta = int(self.cell_loc[d, c2] - self.cell_loc[d, c1])
            if delta > L // 2:
                delta -= L
            elif delta < -(L // 2):
                delta += L
            vec += delta * uc.lvecs[:, d]
        vec += uc.bvecs[:, self.site_to_orbit[site1]] - uc.bvecs[:, self.site_to_orbit[site2]]
        return vec


def sort_neighbor_table(neighbor_table: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Canonical ordering of a neighbor table (Lattices.jl:323-340).

    Returns ``(sorted_table, perm)`` where within each pair the smaller site
    index comes first, and pairs are sorted lexicographically.
    """
    table = neighbor_table.copy()
    if table.shape[1] == 0:
        return table, np.zeros(0, dtype=np.int64)
    swap = table[0] > table[1]
    table[0, swap], table[1, swap] = neighbor_table[1, swap], neighbor_table[0, swap]
    vals = (table.max() + 1) * table[0] + table[1]
    perm = np.argsort(vals, kind="stable")
    return table[:, perm], perm


def translationally_equivalent_sets(lattice: Lattice) -> np.ndarray:
    """Translationally-equivalent site pairs (Lattices.jl:201-257).

    Shape ``(2, ncells, L1, L2, L3, norbits_2, norbits_1)``; retained mainly
    for parity tests — production measurements use FFT convolutions instead.
    """
    L1, L2, L3 = lattice.dims
    norbits = lattice.unit_cell.norbits
    numorbits = lattice.nsites // norbits
    sets = np.zeros((2, numorbits, L1, L2, L3, norbits, norbits), dtype=np.int64)
    for o1 in range(norbits):
        for o2 in range(norbits):
            for l3 in range(L3):
                for l2 in range(L2):
                    for l1 in range(L1):
                        count = 0
                        for site1 in range(o1, lattice.nsites, norbits):
                            site2 = lattice.site_to_site(site1, (l1, l2, l3), o2)
                            sets[0, count, l1, l2, l3, o2, o1] = site1
                            sets[1, count, l1, l2, l3, o2, o1] = site2
                            count += 1
    return sets
