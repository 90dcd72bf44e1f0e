"""GUI parameter validation schemas per dataset format
(reference: each format module defines a MessageConverter with a
JSON schema, e.g. raw.py RawDatasetParams, mib.py MIBDatasetParams).
"""
from __future__ import annotations

from ...common.messageconverter import MessageConverter

_SHAPE = {
    "type": "array",
    "items": {"type": "integer", "minimum": 1},
    "minItems": 1,
}


def _base_properties(type_const: str) -> dict:
    return {
        "type": {"const": type_const},
        "path": {"type": "string"},
        "nav_shape": _SHAPE,
        "sig_shape": _SHAPE,
        "sync_offset": {"type": "integer"},
    }


def _shape_tuples(data: dict) -> dict:
    out = dict(data)
    for key in ("nav_shape", "sig_shape"):
        if out.get(key) is not None:
            out[key] = tuple(out[key])
    out.pop("type", None)
    return out


class _PathConverter(MessageConverter):
    TYPE = "BASE"
    EXTRA: dict = {}
    REQUIRED = ["type", "path"]

    @property
    def SCHEMA(self):  # noqa: N802 (reference naming)
        return {
            "type": "object",
            "properties": {
                **_base_properties(self.TYPE), **self.EXTRA,
            },
            "required": self.REQUIRED,
        }

    def convert_to_python(self, raw_data: dict) -> dict:
        return _shape_tuples(raw_data)


class RawDatasetParams(_PathConverter):
    TYPE = "RAW"
    EXTRA = {"dtype": {"type": "string"}}
    REQUIRED = ["type", "path", "dtype", "nav_shape", "sig_shape"]


class NPYDatasetParams(_PathConverter):
    TYPE = "NPY"


class HDF5DatasetParams(_PathConverter):
    TYPE = "HDF5"
    EXTRA = {"ds_path": {"type": "string"}}


class MIBDatasetParams(_PathConverter):
    TYPE = "MIB"


class K2ISDatasetParams(_PathConverter):
    TYPE = "K2IS"


class EMPADDatasetParams(_PathConverter):
    TYPE = "EMPAD"


class BLODatasetParams(_PathConverter):
    TYPE = "BLO"


class MRCDatasetParams(_PathConverter):
    TYPE = "MRC"


class SEQDatasetParams(_PathConverter):
    TYPE = "SEQ"


class TVIPSDatasetParams(_PathConverter):
    TYPE = "TVIPS"


class SERDatasetParams(_PathConverter):
    TYPE = "SER"


class DMDatasetParams(_PathConverter):
    TYPE = "DM"


class FRMS6DatasetParams(_PathConverter):
    TYPE = "FRMS6"


class RawCSRDatasetParams(_PathConverter):
    TYPE = "RAW_CSR"


CONVERTERS = {
    c.TYPE: c for c in (
        RawDatasetParams, NPYDatasetParams, HDF5DatasetParams,
        MIBDatasetParams, K2ISDatasetParams, EMPADDatasetParams,
        BLODatasetParams, MRCDatasetParams, SEQDatasetParams,
        TVIPSDatasetParams, SERDatasetParams, DMDatasetParams,
        FRMS6DatasetParams, RawCSRDatasetParams,
    )
}


# DataSet class name -> converter (for DataSet.get_msg_converter)
CLASS_CONVERTERS = {
    "RawFileDataSet": RawDatasetParams,
    "NPYDataSet": NPYDatasetParams,
    "H5DataSet": HDF5DatasetParams,
    "MIBDataSet": MIBDatasetParams,
    "K2ISDataSet": K2ISDatasetParams,
    "EMPADDataSet": EMPADDatasetParams,
    "BloDataSet": BLODatasetParams,
    "MRCDataSet": MRCDatasetParams,
    "SEQDataSet": SEQDatasetParams,
    "TVIPSDataSet": TVIPSDatasetParams,
    "SERDataSet": SERDatasetParams,
    "DMDataSet": DMDatasetParams,
    "SingleDMDataSet": DMDatasetParams,
    "FRMS6DataSet": FRMS6DatasetParams,
    "RawCSRDataSet": RawCSRDatasetParams,
}


def get_converter(type_id: str):
    return CONVERTERS.get(type_id.upper())
