"""Asset & scene layer: meshes, materials, scenes, glTF/JSON loading."""
