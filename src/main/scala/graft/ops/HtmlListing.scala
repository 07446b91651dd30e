package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The S7 scraper's EXTRACTION semantics, in-engine: the reference
  * drives a browser to a listing page and pulls fields out of the DOM
  * (`jobs/propnex_selenium.py:20-165`); the browser-driving half
  * (clicks, scrolls, waits) is out-of-engine by design (SURVEY §1.4),
  * but the field extraction itself is pure text→fields work — exactly
  * what a 100 TB crawl pipeline runs IN Spark over stored pages
  * (fetch separately, parse at scale). This operator replays the
  * scraper's observable extraction over an HTML string column with
  * codegen'd built-ins only (regexp_extract/_all, filter, transform —
  * no UDF, no driver loop): per-row scan work, no shuffle, no state.
  *
  * Parity map (selector → rule), from `propnex_selenium.py`:
  *  - location: first `<h1>` (PN:27 via the details column's h1)
  *  - price: first `strong.mr-1`; price_psf: first `p.mt-2` (PN:29-30)
  *  - `div.lbb-21` list rows dispatch on the row icon's src (PN:40-53):
  *    `ic_location.png`→ the row's `<p>` text, `ic_beds.png`/
  *    `ic_baths.png`/`ic_sqft.png`→ the row's full text. The scraper's
  *    loop ASSIGNS on every match, so the LAST matching row wins —
  *    mirrored with `try_element_at(filter(...), -1)`.
  *  - `div.agent-dt-box`: `h5`→ agent_name; its `<p>` tags dispatch by
  *    content — leading `#R`→ agent_id, containing `+65`→ phone,
  *    lower containing `.com`→ email; last match wins (PN:64-82).
  *  - `div.property-list-box`: `<ul>`s alternate name-list / value-list;
  *    li texts zip into a dict, later duplicate keys overwriting
  *    earlier (Python `dict(zip(...))`), truncated to the shorter side
  *    (Python `zip`); lookups default 'None' (PN:85-100,139-160).
  *  - description: first `div.desc-box` `<p>`, default '' (PN:126-129);
  *    facilities: every `li.facilities-icons` row's `<p>` text joined
  *    with ", " (PN:132-137).
  *  - any absent element → the scraper's 'None' sentinel (its
  *    `get_element_text` default, PN:200-205).
  *
  * Text extraction mirrors Selenium's `.text` on listing markup:
  * `<br>` becomes a newline (the multi-line street/town/district
  * value, FIXTURES.md A1), remaining tags drop, the five standard
  * entities decode, and the result is trimmed. This is class-anchored
  * FLAT extraction — each section is located independently in the
  * page and captured to its nearest `</div>`, so it does not depend
  * on (or handle) div nesting inside a section; on the listing shape
  * the scraper targets (sections contain only ul/li/p/h* markup) the
  * two agree, and HtmlListingSpec pins that agreement on a
  * reference-shaped page. */
object HtmlListing {

  private val None_ = "None"

  /** Selenium-`.text`-alike: `<br>`→newline, tags out, entities
    * decoded, trimmed. */
  private def text(c: Column): Column = {
    val br = regexp_replace(c, "(?i)<br\\s*/?>", "\n")
    val noTags = regexp_replace(br, "<[^>]*>", "")
    val ent = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
        lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
        lit("&amp;"), lit("&"))
    trim(ent)
  }

  private def classPat(tag: String, cls: String): String =
    s"""(?s)<$tag[^>]*class="[^"]*\\b$cls\\b[^"]*"[^>]*>(.*?)</$tag>"""

  /** First match of `pat` group 1 as Selenium text; absent → `dflt`.
    * regexp_extract returns '' for both no-match and empty-capture, so
    * absence is distinguished with an rlike guard (same scan, both
    * codegen'd). */
  private def firstText(html: Column, pat: String,
                        dflt: String = None_): Column =
    when(html.rlike(pat), text(regexp_extract(html, pat, 1)))
      .otherwise(lit(dflt))

  private def section(html: Column, cls: String): Column =
    regexp_extract(html, classPat("div", cls), 1)

  /** All `<li>...</li>` blocks of a fragment (outer markup kept, so
    * callers can dispatch on attributes inside). */
  private def liBlocks(frag: Column): Column =
    regexp_extract_all(frag, lit("(?s)<li[^>]*>.*?</li>"), lit(0))

  /** The last block containing `needle`, or null. */
  private def lastWith(blocks: Column, needle: String): Column =
    try_element_at(filter(blocks, b => instr(b, needle) > 0), lit(-1))

  private def pText(frag: Column): Column =
    text(regexp_extract(frag, "(?s)<p[^>]*>(.*?)</p>", 1))

  /** Python-`dict(zip(names, vals))[key]` with 'None' default: the
    * LAST pair whose name equals `key`, over pairs truncated to the
    * shorter list. */
  private def zipLookup(names: Column, vals: Column, key: String): Column = {
    val n = least(size(names), size(vals))
    val pairs = arrays_zip(slice(names, lit(1), n), slice(vals, lit(1), n))
      .cast("array<struct<name:string,value:string>>")
    coalesce(
      try_element_at(filter(pairs, p => p.getField("name") === key), lit(-1))
        .getField("value"),
      lit(None_))
  }

  /** The scraper's 25-field dict over `(url, html)` — same names, same
    * order, same sentinels ('None' / '' / comma-joined facilities) as
    * `propnex_selenium.py:139-165`, so the output feeds
    * `jobs/PropnexJob.transform` exactly like the fixture JSON does. */
  def parsePropnex(url: Column, html: Column): Column = {
    val lis = liBlocks(section(html, "lbb-21"))
    def liText(needle: String, pOnly: Boolean): Column = {
      val hit = lastWith(lis, needle)
      coalesce(when(hit.isNotNull,
        if (pOnly) pText(hit) else text(hit)), lit(None_))
    }
    val agentBox = section(html, "agent-dt-box")
    val agentPs = transform(
      regexp_extract_all(agentBox, lit("(?s)<p[^>]*>(.*?)</p>"), lit(1)),
      p => text(p))
    def agentP(pred: Column => Column): Column =
      coalesce(try_element_at(filter(agentPs, pred), lit(-1)), lit(None_))
    val plBox = section(html, "property-list-box")
    val uls = transform(
      regexp_extract_all(plBox, lit("(?s)<ul[^>]*>.*?</ul>"), lit(0)),
      (u, i) => struct(u.as("u"), i.as("i")))
    def liTexts(ul: Column): Column =
      transform(regexp_extract_all(ul,
        lit("(?s)<li[^>]*>(.*?)</li>"), lit(1)), b => text(b))
    val names = flatten(transform(
      filter(uls, x => x.getField("i") % 2 === 0),
      x => liTexts(x.getField("u"))))
    val vals = flatten(transform(
      filter(uls, x => x.getField("i") % 2 === 1),
      x => liTexts(x.getField("u"))))
    def detail(key: String): Column = zipLookup(names, vals, key)
    val facilities = array_join(transform(
      regexp_extract_all(html,
        lit(classPat("li", "facilities-icons")), lit(0)),
      b => pText(b)), ", ")
    struct(
      url.as("url"),
      firstText(html, "(?s)<h1[^>]*>(.*?)</h1>").as("location"),
      firstText(html, classPat("strong", "mr-1")).as("price"),
      firstText(html, classPat("p", "mt-2")).as("price_psf"),
      liText("ic_location.png", pOnly = true).as("street_town_district"),
      liText("ic_beds.png", pOnly = false).as("num_bedroom"),
      liText("ic_baths.png", pOnly = false).as("num_bathroom"),
      liText("ic_sqft.png", pOnly = false).as("floor_area_sqft"),
      firstText(agentBox, "(?s)<h5[^>]*>(.*?)</h5>").as("agent_name"),
      agentP(p => p.startsWith("#R")).as("agent_id"),
      agentP(p => lower(p).contains(".com")).as("agent_email"),
      agentP(p => p.contains("+65")).as("agent_phone_num"),
      detail("Listing Type").as("listing_type"),
      detail("Property Group").as("property_group"),
      detail("Property Type").as("property_type"),
      detail("District").as("district"),
      detail("Floor Area").as("total_floor_area"),
      detail("TOP").as("top"),
      detail("Furnishing").as("furnishing"),
      detail("Tenure").as("tenure"),
      detail("Floor").as("floor"),
      detail("Post Code").as("post_code"),
      detail("Street Name").as("street_name"),
      firstText(section(html, "desc-box"),
        "(?s)<p[^>]*>(.*?)</p>", dflt = "").as("description"),
      facilities.as("facilities"))
  }
}
