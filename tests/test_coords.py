from action_pdf_accessibility_paddle_docker_ray.functions.coords import (
    bbox_strings,
    cell_bbox,
    element_bbox,
    number_region_flag,
)


def test_element_floor_ceil_asymmetry():
    # elements: floor mins / ceil maxes (/root/reference/src/template_json.py:233-237)
    left, bottom, right, top = element_bbox([10.6, 20.4, 30.2, 40.8], 2.0, 1584)
    assert left == 10 / 2.0
    assert right == 31 / 2.0
    assert top == (1584 - 20) / 2.0
    assert bottom == (1584 - 41) / 2.0


def test_cell_reversed_rounding():
    # cells: ceil mins / floor maxes (/root/reference/src/template_json.py:415-420)
    left, bottom, right, top = cell_bbox([10.6, 20.4, 30.2, 40.8], 2.0, 1584)
    assert left == 11 / 2.0
    assert right == 30 / 2.0
    assert top == (1584 - 21) / 2.0
    assert bottom == (1584 - 40) / 2.0


def test_bbox_strings_are_strings():
    assert bbox_strings((1.0, 2.5, 3.0, 4.0)) == ["1.0", "2.5", "3.0", "4.0"]


def test_number_flag_uses_device_height_quirk():
    # page-coord top compared against device px half-height
    # (/root/reference/src/template_json.py:440-453)
    assert number_region_flag(700.0, 1584) == "footer"  # 700 < 792
    assert number_region_flag(800.0, 1584) == "header"
