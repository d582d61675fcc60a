import numpy as np

from elphdynamics_tpu.lattice import Lattice, UnitCell, sort_neighbor_table


def square_lattice(L=4):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    return Lattice.create(uc, L)


def test_unitcell_reciprocal():
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    # rlvecs columns dot lvecs columns = 2π δ
    assert np.allclose(uc.rlvecs.T @ uc.lvecs, 2 * np.pi * np.eye(3))


def test_lattice_maps():
    lat = square_lattice(4)
    assert lat.nsites == 16
    assert lat.loc_to_site(0, 0, 0) == 0
    assert lat.loc_to_site(0, 1, 0) == 1
    assert lat.loc_to_site(0, 0, 1) == 4
    # periodic wrap
    assert lat.loc_to_site(0, 4, 0) == 0
    assert lat.loc_to_site(0, -1, 0) == 3
    # site_to_site displacement
    assert lat.site_to_site(0, (1, 0, 0), 0) == 1
    assert lat.site_to_site(3, (1, 0, 0), 0) == 0


def test_neighbor_table_square():
    lat = square_lattice(4)
    tx = lat.calc_neighbor_table(0, 0, (1, 0, 0))
    ty = lat.calc_neighbor_table(0, 0, (0, 1, 0))
    assert tx.shape == (2, 16)
    assert ty.shape == (2, 16)
    # every site appears exactly twice in each direction (in + out)
    counts = np.bincount(tx.reshape(-1), minlength=16)
    assert np.all(counts == 2)


def test_neighbor_table_dedup_small():
    # L=2 chain: displacement +1 and -1 give identical bonds -> dedup
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 2)
    t = lat.calc_neighbor_table(0, 0, (1, 0, 0))
    assert t.shape == (2, 1)


def test_sort_neighbor_table():
    table = np.array([[3, 0, 2], [1, 2, 0]])
    sorted_t, perm = sort_neighbor_table(table)
    assert np.all(sorted_t[0] <= sorted_t[1])
    vals = 10 * sorted_t[0] + sorted_t[1]
    assert np.all(np.diff(vals) >= 0)


def test_honeycomb_two_orbits():
    uc = UnitCell.create(
        2, 2,
        [[3.0 / 2.0, np.sqrt(3.0) / 2.0], [3.0 / 2.0, -np.sqrt(3.0) / 2.0]],
        [[0.0, 0.0], [1.0, 0.0]],
    )
    lat = Lattice.create(uc, 3)
    assert lat.nsites == 18
    t = lat.calc_neighbor_table(0, 1, (0, 0, 0))
    assert t.shape == (2, 9)
    # orbit bookkeeping
    assert np.all(lat.site_to_orbit[t[0]] == 0)
    assert np.all(lat.site_to_orbit[t[1]] == 1)


def test_translationally_equivalent_sets():
    from elphdynamics_tpu.lattice import translationally_equivalent_sets

    lat = square_lattice(3)
    sets = translationally_equivalent_sets(lat)
    assert sets.shape == (2, 9, 3, 3, 1, 1, 1)
    # displacement (1,0): each pair's second site is the +x neighbor
    for c in range(9):
        s1 = sets[0, c, 1, 0, 0, 0, 0]
        s2 = sets[1, c, 1, 0, 0, 0, 0]
        assert s2 == lat.site_to_site(s1, (1, 0, 0), 0)
    # zero displacement is the identity pairing
    assert np.all(sets[0, :, 0, 0, 0, 0, 0] == sets[1, :, 0, 0, 0, 0, 0])
