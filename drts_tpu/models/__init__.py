"""Scene representation, geometry generators, the demo scene, and the
flagship render pipeline (the reference's Scene/MyScene/App layers)."""
