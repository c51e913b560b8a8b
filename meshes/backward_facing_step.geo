// Backward-facing step channel (same geometry as
// navierstokes_tpu.mesh.backward_facing_step and the reference's
// gmsh-collection BFS: inlet channel [0,2] x [0.5,1], step at x=2,
// expanded channel [2,12] x [0,1]).
//
// A pre-generated backward_facing_step.msh ships next to this file, so
// the import pipeline (extract_facet_markers -> generate_msh -> read_msh)
// works without a gmsh binary; with gmsh on PATH this file regenerates it.

h = 0.0625;

Point(1) = {0, 0.5, 0, h};
Point(2) = {2, 0.5, 0, h};
Point(3) = {2, 0, 0, h};
Point(4) = {12, 0, 0, h};
Point(5) = {12, 1, 0, h};
Point(6) = {0, 1, 0, h};

Line(1) = {1, 2};  // inlet-channel lower wall
Line(2) = {2, 3};  // step face
Line(3) = {3, 4};  // expanded-channel lower wall
Line(4) = {4, 5};  // outlet
Line(5) = {5, 6};  // upper wall
Line(6) = {6, 1};  // inlet

Curve Loop(1) = {1, 2, 3, 4, 5, 6};
Plane Surface(1) = {1};

Physical Curve("inlet", 1) = {6};
Physical Curve("outlet", 2) = {4};
Physical Curve("walls", 3) = {1, 2, 3, 5};
Physical Surface("fluid", 1) = {1};
