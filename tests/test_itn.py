"""Rule-based Chinese ITN fallback (ppasr_tpu/utils/itn.py)."""
from ppasr_tpu.utils.itn import inverse_normalize


def test_cardinals():
    assert inverse_normalize('三百二十五') == '325'
    assert inverse_normalize('一万二千') == '12000'
    assert inverse_normalize('两千零一') == '2001'
    assert inverse_normalize('十五') == '15'
    assert inverse_normalize('一亿三千万') == '130000000'


def test_digit_sequences():
    assert inverse_normalize('二零二五') == '2025'
    assert inverse_normalize('电话一三八零零') == '电话13800'


def test_decimals_percent_negative():
    assert inverse_normalize('三点一四') == '3.14'
    assert inverse_normalize('百分之六十') == '60%'
    assert inverse_normalize('百分之三点五') == '3.5%'
    assert inverse_normalize('负五十') == '-50'


def test_in_sentence():
    assert inverse_normalize('他买了三百二十五个苹果') == '他买了325个苹果'
    assert inverse_normalize('增长了百分之十五左右') == '增长了15%左右'


def test_conservative_single_chars():
    # lone numerals inside ordinary words stay characters
    assert inverse_normalize('我们一起走') == '我们一起走'
    assert inverse_normalize('万一有事') == '万一有事'
    assert inverse_normalize('你好世界') == '你好世界'
