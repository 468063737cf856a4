"""Pure math primitives shared by the renderer and the models."""
