"""gmsh `.msh` file I/O (ASCII v2.2 and v4.1).

Replaces deal.II's `GridIn::read_msh` (ref: src/NavierStokes2D.cpp:10-14).
Reads linear simplices (triangles/tets) plus the tagged boundary facets
(lines in 2D, triangles in 3D); the physical tag of each facet becomes
`Mesh.bface_tag`, matching the reference's boundary-id scheme.
"""

from __future__ import annotations

import numpy as np

from navierstokes_project_nm4pde_tpu.mesh.core import Mesh

# gmsh element type ids
_LINE = 1
_TRI = 2
_TET = 4


def read_msh(path: str) -> Mesh:
    with open(path, "r") as f:
        lines = f.read().splitlines()
    version = None
    nodes = {}
    elements = []  # (etype, phys_tag, [node ids])
    ent_phys = {}  # (entity_dim, entity_tag) -> physical tag  (v4.x only)
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line == "$MeshFormat":
            version = float(lines[i + 1].split()[0])
            i += 3
        elif line == "$Entities":
            i = _read_entities_v4(lines, i + 1, ent_phys, version)
        elif line == "$Nodes":
            if version is not None and version >= 4.0:
                i = _read_nodes_v4(lines, i + 1, nodes)
            else:
                i = _read_nodes_v2(lines, i + 1, nodes)
        elif line == "$Elements":
            if version is not None and version >= 4.0:
                i = _read_elements_v4(lines, i + 1, elements, ent_phys)
            else:
                i = _read_elements_v2(lines, i + 1, elements)
        else:
            i += 1

    if not nodes:
        raise ValueError(f"no nodes found in {path}")

    # Compact node numbering.
    ids = np.array(sorted(nodes.keys()), dtype=np.int64)
    remap = {int(g): k for k, g in enumerate(ids)}
    coords3 = np.array([nodes[int(g)] for g in ids], dtype=np.float64)

    tets = [(t, n) for (e, t, n) in elements if e == _TET]
    tris = [(t, n) for (e, t, n) in elements if e == _TRI]
    lns = [(t, n) for (e, t, n) in elements if e == _LINE]

    if tets:
        dim = 3
        cells = np.array([n for _, n in tets], dtype=np.int64)
        bf = np.array([n for _, n in tris], dtype=np.int64).reshape(-1, 3)
        bt = np.array([t for t, _ in tris], dtype=np.int32)
    elif tris:
        dim = 2
        cells = np.array([n for _, n in tris], dtype=np.int64)
        bf = np.array([n for _, n in lns], dtype=np.int64).reshape(-1, 2)
        bt = np.array([t for t, _ in lns], dtype=np.int32)
    else:
        raise ValueError(f"no volume elements in {path}")

    conv = np.vectorize(lambda g: remap[int(g)], otypes=[np.int64])
    cells = conv(cells)
    bf = conv(bf) if bf.size else bf.astype(np.int64)
    coords = coords3[:, :dim]
    mesh = Mesh(coords, cells.astype(np.int32), bf.astype(np.int32), bt)
    # Keep only facets that are actually on the boundary (gmsh files may tag
    # interior surfaces too).
    try:
        mesh.check_boundary_closed()
    except ValueError:
        keys_all, _, _ = mesh._all_facets()
        k = Mesh._facet_keys(keys_all)
        uniq, counts = np.unique(k, return_counts=True)
        bnd = set(uniq[counts == 1].tolist())
        bk = Mesh._facet_keys(np.sort(mesh.bface_verts, axis=1))
        keep = np.array([kk in bnd for kk in bk.tolist()])
        mesh = Mesh(coords, mesh.cells, mesh.bface_verts[keep], mesh.bface_tag[keep])
    return mesh


def _read_nodes_v2(lines, i, nodes):
    n = int(lines[i].split()[0])
    for k in range(n):
        parts = lines[i + 1 + k].split()
        nodes[int(parts[0])] = (float(parts[1]), float(parts[2]), float(parts[3]))
    i += 1 + n
    assert lines[i].strip() == "$EndNodes"
    return i + 1


def _read_elements_v2(lines, i, elements):
    n = int(lines[i].split()[0])
    for k in range(n):
        parts = lines[i + 1 + k].split()
        etype = int(parts[1])
        ntags = int(parts[2])
        phys = int(parts[3]) if ntags >= 1 else 0
        node_ids = [int(x) for x in parts[3 + ntags:]]
        elements.append((etype, phys, node_ids))
    i += 1 + n
    assert lines[i].strip() == "$EndElements"
    return i + 1


def _read_nodes_v4(lines, i, nodes):
    header = lines[i].split()
    num_blocks = int(header[0])
    i += 1
    for _ in range(num_blocks):
        _, _, _, num = (int(x) for x in lines[i].split())
        tags = [int(lines[i + 1 + k]) for k in range(num)]
        for k in range(num):
            parts = lines[i + 1 + num + k].split()
            nodes[tags[k]] = (float(parts[0]), float(parts[1]), float(parts[2]))
        i += 1 + 2 * num
    assert lines[i].strip() == "$EndNodes"
    return i + 1


def _read_entities_v4(lines, i, ent_phys, version=4.1):
    """Parse $Entities: map (entityDim, entityTag) -> first physical tag.

    gmsh v4.x element blocks carry only *geometric* entity tags; the
    physical (boundary-id) tags live here.  deal.II's read_msh (what the
    reference loads meshes with, ref: src/NavierStokes2D.cpp:10-14) keys
    boundary ids off the physical groups, so we must too."""
    counts = [int(x) for x in lines[i].split()]  # points curves surfaces volumes
    i += 1
    for dim, cnt in enumerate(counts):
        for _ in range(cnt):
            parts = lines[i].split()
            tag = int(parts[0])
            # v4.1 points: tag x y z; v4.0 points carry a full min/max
            # bounding box like higher-dim entities; higher dims: tag + bbox
            if dim == 0:
                off = 4 if (version is None or version >= 4.1) else 7
            else:
                off = 7
            nphys = int(parts[off])
            if nphys >= 1:
                ent_phys[(dim, tag)] = int(parts[off + 1])
            i += 1
    assert lines[i].strip() == "$EndEntities"
    return i + 1


def _read_elements_v4(lines, i, elements, ent_phys):
    header = lines[i].split()
    num_blocks = int(header[0])
    i += 1
    for _ in range(num_blocks):
        ent_dim, ent_tag, etype, num = (int(x) for x in lines[i].split())
        tag = ent_phys.get((ent_dim, ent_tag), ent_tag)
        for k in range(num):
            parts = [int(x) for x in lines[i + 1 + k].split()]
            elements.append((etype, tag, parts[1:]))
        i += 1 + num
    assert lines[i].strip() == "$EndElements"
    return i + 1


def write_msh_v41(mesh: Mesh, path: str) -> None:
    """Write a v4.1 ASCII `.msh` with proper $Entities physical groups.

    Each boundary tag t becomes its own facet entity with *geometric* tag
    t + 1 and *physical* tag t, so a reader that wrongly uses entity tags
    produces visibly wrong boundary ids (the round-trip test relies on
    this to pin the entity -> physical mapping)."""
    dim = mesh.dim
    fdim = dim - 1
    tags = sorted(set(int(t) for t in mesh.bface_tag))
    lo = mesh.coords.min(axis=0)
    hi = mesh.coords.max(axis=0)
    lo3 = list(lo) + [0.0] * (3 - dim)
    hi3 = list(hi) + [0.0] * (3 - dim)
    bbox = " ".join(f"{v:.16g}" for v in lo3 + hi3)
    with open(path, "w") as f:
        f.write("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n")
        # --- entities: one facet entity per boundary tag + one cell entity
        counts = [0, 0, 0, 0]
        counts[fdim] = len(tags)
        counts[dim] = 1
        f.write("$Entities\n" + " ".join(str(c) for c in counts) + "\n")
        for t in tags:
            nb = "0"  # no bounding sub-entities recorded
            f.write(f"{t + 1} {bbox} 1 {t} {nb}\n")
        f.write(f"1 {bbox} 0 0\n")
        f.write("$EndEntities\n")
        # --- nodes: two blocks on the cell entity (exercises block iteration)
        n = mesh.n_vertices
        half = n // 2
        blocks = [(1, half), (half + 1, n)] if half else [(1, n)]
        f.write(f"$Nodes\n{len(blocks)} {n} 1 {n}\n")
        for a, b in blocks:
            f.write(f"{dim} 1 0 {b - a + 1}\n")
            for k in range(a, b + 1):
                f.write(f"{k}\n")
            for k in range(a, b + 1):
                p = mesh.coords[k - 1]
                z = p[2] if dim == 3 else 0.0
                f.write(f"{p[0]:.16g} {p[1]:.16g} {z:.16g}\n")
        f.write("$EndNodes\n")
        # --- elements: one block per boundary tag + the cell block
        n_elem = mesh.n_cells + mesh.n_bfaces
        nb = len(tags) + 1
        f.write(f"$Elements\n{nb} {n_elem} 1 {n_elem}\n")
        eid = 1
        ftype = _LINE if dim == 2 else _TRI
        for t in tags:
            sel = np.where(mesh.bface_tag == t)[0]
            f.write(f"{fdim} {t + 1} {ftype} {len(sel)}\n")
            for fi in sel:
                ns = " ".join(str(v + 1) for v in mesh.bface_verts[fi])
                f.write(f"{eid} {ns}\n")
                eid += 1
        ctype = _TRI if dim == 2 else _TET
        f.write(f"{dim} 1 {ctype} {mesh.n_cells}\n")
        for cv in mesh.cells:
            ns = " ".join(str(v + 1) for v in cv)
            f.write(f"{eid} {ns}\n")
            eid += 1
        f.write("$EndElements\n")


def write_msh(mesh: Mesh, path: str) -> None:
    """Write a v2.2 ASCII `.msh` (round-trip capable with `read_msh`)."""
    dim = mesh.dim
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{mesh.n_vertices}\n")
        for i, p in enumerate(mesh.coords):
            x, y = p[0], p[1]
            z = p[2] if dim == 3 else 0.0
            f.write(f"{i + 1} {x:.16g} {y:.16g} {z:.16g}\n")
        f.write("$EndNodes\n")
        n_elem = mesh.n_cells + mesh.n_bfaces
        f.write(f"$Elements\n{n_elem}\n")
        eid = 1
        ftype = _LINE if dim == 2 else _TRI
        for fv, tag in zip(mesh.bface_verts, mesh.bface_tag):
            ns = " ".join(str(v + 1) for v in fv)
            f.write(f"{eid} {ftype} 2 {tag} {tag} {ns}\n")
            eid += 1
        ctype = _TRI if dim == 2 else _TET
        for cv in mesh.cells:
            ns = " ".join(str(v + 1) for v in cv)
            f.write(f"{eid} {ctype} 2 0 0 {ns}\n")
            eid += 1
        f.write("$EndElements\n")
