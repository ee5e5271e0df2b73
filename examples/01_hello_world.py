"""Hello world: one cube, camera, light; randomize() -> render loop.

Reference twin: examples/01_hello_world.py (scene XML + cv2 imshow loop).
"""

from _common import render_randomized_variants, save_variants

from fireflies_tpu.assets import scenes

if __name__ == "__main__":
    scene, kwargs = scenes.hello_world()
    # The reference randomizes the cube's rotation each frame; hello_world()
    # already specifies rotate_z(-pi, pi).
    images = render_randomized_variants(scene, kwargs)
    save_variants("01_hello_world", images)
