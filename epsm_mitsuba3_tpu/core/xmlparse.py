"""Mitsuba XML scene parser (TPU analog of src/core/xml.cpp).

Parses the Mitsuba 3 XML dialect into the nested-dict scene description
consumed by ``load_dict`` — the same two-stage structure as the reference
(``parse_xml`` xml.cpp:431 builds Properties; ``instantiate_node`` :1067
constructs objects).  Supports:

 * <scene version=...>, nested plugin tags (integrator/sensor/film/sampler/
   bsdf/shape/emitter/texture/rfilter/phase/medium/volume)
 * value tags: float/integer/boolean/string/point/vector/rgb/spectrum
 * <transform name="to_world"> with translate/rotate/scale/matrix/lookat
 * <ref id=...>, <default name=.. value=..>, $param substitution
   (xml.cpp ``$`` handling + CLI -D overrides)
 * <include filename=...>
"""
from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from typing import Dict, Optional

import numpy as np

from .transform import ScalarTransform4f


_PLUGIN_TAGS = {
    "integrator", "sensor", "film", "sampler", "bsdf", "shape", "emitter",
    "texture", "rfilter", "phase", "medium", "volume", "spectrum_plugin",
}


def _subst(text: str, params: Dict[str, str]) -> str:
    """$name parameter substitution (xml.cpp:200-230)."""
    if "$" not in text:
        return text

    def repl(mm):
        key = mm.group(1)
        if key not in params:
            raise ValueError(f"undefined scene parameter ${key}")
        return str(params[key])

    return re.sub(r"\$(\w+)", repl, text)


def _floats(s: str):
    return [float(x) for x in re.split(r"[,\s]+", s.strip()) if x]


def _parse_transform(elem, params) -> np.ndarray:
    t = ScalarTransform4f()
    for child in elem:
        tag = child.tag
        g = lambda k, d=None: (_subst(child.get(k), params)  # noqa: E731
                               if child.get(k) is not None else d)
        if tag == "translate":
            v = [float(g("x", 0)), float(g("y", 0)), float(g("z", 0))]
            if g("value"):
                v = _floats(g("value"))
            t = ScalarTransform4f(np.asarray(
                ScalarTransform4f().translate(v).matrix) @ np.asarray(t.matrix))
        elif tag == "scale":
            if g("value"):
                vals = _floats(g("value"))
                v = vals * 3 if len(vals) == 1 else vals
            else:
                v = [float(g("x", 1)), float(g("y", 1)), float(g("z", 1))]
            t = ScalarTransform4f(np.asarray(
                ScalarTransform4f().scale(v).matrix) @ np.asarray(t.matrix))
        elif tag == "rotate":
            axis = [float(g("x", 0)), float(g("y", 0)), float(g("z", 0))]
            angle = float(g("angle", 0))
            t = ScalarTransform4f(np.asarray(
                ScalarTransform4f().rotate(axis, angle).matrix)
                @ np.asarray(t.matrix))
        elif tag == "matrix":
            vals = _floats(g("value"))
            mat = np.asarray(vals, np.float32)
            mat = mat.reshape(4, 4) if mat.size == 16 else _mat3_to4(mat)
            t = ScalarTransform4f(mat @ np.asarray(t.matrix))
        elif tag in ("lookat", "look_at"):
            origin = _floats(g("origin"))
            target = _floats(g("target"))
            up = _floats(g("up", "0, 1, 0"))
            t = ScalarTransform4f(np.asarray(
                ScalarTransform4f().look_at(origin, target, up).matrix)
                @ np.asarray(t.matrix))
        else:
            raise ValueError(f"unknown transform op <{tag}>")
    return t


def _mat3_to4(m):
    m = m.reshape(3, 3)
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = m
    return out


def _parse_value(child, params):
    tag = child.tag
    val = child.get("value")
    if val is not None:
        val = _subst(val, params)
    if tag == "float":
        return float(val)
    if tag == "integer":
        return int(val)
    if tag == "boolean":
        return val.lower() == "true"
    if tag == "string":
        return val
    if tag in ("point", "vector"):
        if val is not None:
            return _floats(val)
        return [float(_subst(child.get(k, "0"), params)) for k in "xyz"]
    if tag == "rgb":
        v = _floats(val)
        return {"type": "rgb", "value": v if len(v) == 3 else v[0]}
    if tag == "spectrum":
        # uniform value or wavelength:value list
        if ":" in val:
            pairs = [p.split(":") for p in re.split(r"[,\s]+", val) if p]
            return {"type": "irregular",
                    "wavelengths": [float(p[0]) for p in pairs],
                    "values": [float(p[1]) for p in pairs]}
        return {"type": "uniform", "value": float(val)}
    raise ValueError(f"unknown value tag <{tag}>")


def parse_element(elem, params, base_dir, id_map) -> Dict:
    """Plugin element -> nested dict (xml.cpp parse_xml:431)."""
    d = {"type": _subst(elem.get("type", ""), params)}
    if elem.get("id"):
        d["id"] = elem.get("id")
    anon = 0
    for child in elem:
        tag = child.tag
        name = child.get("name")
        if tag == "transform":
            d[name or "to_world"] = _parse_transform(child, params)
        elif tag == "ref":
            rid = child.get("id")
            d[name or f"_ref{anon}"] = {"type": "ref", "id": rid}
            anon += 1
        elif tag in _PLUGIN_TAGS:
            sub = parse_element(child, params, base_dir, id_map)
            key = name or tag
            if key in d:
                key = f"{tag}{anon}"
            d[key] = sub
            anon += 1
            if "id" in sub:
                id_map[sub["id"]] = sub
        elif tag == "default":
            params.setdefault(child.get("name"), child.get("value"))
        else:
            value = _parse_value(child, params)
            if tag == "string" and name == "filename":
                value = value if os.path.isabs(value) else os.path.join(
                    base_dir, value)
            d[name] = value
    return d


def load_string(text: str, parameters: Optional[Dict[str, str]] = None,
                base_dir: str = "."):
    """mi.load_string analog: XML text -> scene dict -> Scene."""
    from ..models.scene import load_dict

    params = dict(parameters or {})
    root = ET.fromstring(text)
    if root.tag != "scene":
        # single plugin (e.g. load_string of a bsdf) -> return the dict
        id_map: Dict[str, Dict] = {}
        return parse_element(root, params, base_dir, id_map)

    d = {"type": "scene"}
    id_map: Dict[str, Dict] = {}
    anon = 0
    for child in root:
        if child.tag == "default":
            params.setdefault(child.get("name"), child.get("value"))
            continue
        if child.tag == "include":
            fn = os.path.join(base_dir, child.get("filename"))
            with open(fn) as f:
                sub = ET.fromstring(f.read())
            for sc in sub:
                cd = parse_element(sc, params, os.path.dirname(fn), id_map)
                d[cd.get("id") or f"_elem{anon}"] = cd
                anon += 1
            continue
        if child.tag in _PLUGIN_TAGS:
            cd = parse_element(child, params, base_dir, id_map)
            key = cd.get("id") or child.get("name") or f"_elem{anon}"
            d[key] = cd
            anon += 1
            if "id" in cd:
                id_map[cd["id"]] = cd
        elif child.tag == "alias":
            id_map[child.get("as")] = id_map[child.get("id")]
        else:
            raise ValueError(f"unexpected top-level tag <{child.tag}>")
    return load_dict(d)


def load_file(path: str, parameters: Optional[Dict[str, str]] = None):
    """mi.load_file analog (xml.cpp:1016 ``load_file``)."""
    with open(path) as f:
        return load_string(f.read(), parameters, os.path.dirname(
            os.path.abspath(path)))
