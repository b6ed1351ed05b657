from graphcast_tpu.geometry.icosahedron import (  # noqa: F401
    TriangularMesh,
    get_icosahedron,
    get_mesh_hierarchy,
    merge_meshes,
    faces_to_edges,
)
