from action_pdf_accessibility_paddle_docker_ray.functions.fnv import (
    K_PDE_IMAGE,
    fnv1a_32,
    region_unique_id,
)


def test_fnv1a_known_vectors():
    # standard FNV-1a 32-bit test vectors
    assert fnv1a_32("") == 0x811C9DC5
    assert fnv1a_32("a") == 0xE40C292C
    assert fnv1a_32("foobar") == 0xBF9CF968


def test_region_id_truncates_coordinates():
    # int() truncation, not rounding (/root/reference/src/template_json.py:131)
    assert region_unique_id(3, K_PDE_IMAGE, [10.9, 20.1, 30.99, 40.0]) == region_unique_id(
        3, K_PDE_IMAGE, [10, 20, 30, 40]
    )
    assert region_unique_id(3, K_PDE_IMAGE, [10, 20, 30, 40]) != region_unique_id(
        3, K_PDE_IMAGE, [11, 20, 30, 40]
    )


def test_region_id_is_32bit_and_page_dependent():
    a = region_unique_id(0, K_PDE_IMAGE, [1, 2, 3, 4])
    b = region_unique_id(1, K_PDE_IMAGE, [1, 2, 3, 4])
    assert a != b
    assert 0 <= a <= 0xFFFFFFFF
