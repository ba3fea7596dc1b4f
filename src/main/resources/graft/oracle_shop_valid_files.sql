WITH meta(filename, shop_name, valid_from, valid_to, valid) AS (VALUES
('esomarket_flyer.pdf', 'EsoMarket', DATE '2024-09-01', DATE '2024-09-30', true),
('penny_flyer.pdf', 'Penny', DATE '2024-10-01', DATE '2024-10-31', true),
('billa_flyer.pdf', 'Billa', DATE '2024-10-01', DATE '2024-10-31', false),
('albert_hypermarket_flyer.pdf', 'Albert Hypermarket', DATE '2024-10-10', DATE '2024-10-20', true),
('albert_supermarket_flyer.pdf', 'Albert Supermarket', DATE '2024-10-10', DATE '2024-10-20', false),
('tesco_supermarket_flyer.pdf', 'Tesco Supermarket', DATE '2024-10-01', DATE '2024-10-31', true),
('tesco_hypermarket_flyer.pdf', 'Tesco Hypermarket', DATE '2024-10-16', DATE '2024-11-05', true),
('lidl_flyer.pdf', 'Lidl', DATE '2024-10-10', DATE '2024-10-20', true),
('kaufland_flyer.pdf', 'Kaufland', DATE '2024-09-01', DATE '2024-09-30', true),
('flop_top_flyer.pdf', 'Flop Top', DATE '2024-10-16', DATE '2024-11-05', false),
('flop_flyer.pdf', 'Flop', DATE '2024-09-01', DATE '2024-09-30', true),
('travel_free_flyer.pdf', 'Travel Free', DATE '2024-10-16', DATE '2024-11-05', false),
('cba_potraviny_flyer.pdf', 'CBA Potraviny', DATE '2024-10-10', DATE '2024-10-20', true),
('bene_flyer.pdf', 'Bene', DATE '2024-10-16', DATE '2024-11-05', false),
('cba_premium_flyer.pdf', 'CBA Premium', DATE '2024-09-01', DATE '2024-09-30', true),
('lidl_shop_flyer.pdf', 'Lidl Shop', DATE '2024-09-01', DATE '2024-09-30', false),
('cba_market_flyer.pdf', 'CBA Market', DATE '2024-09-01', DATE '2024-09-30', true),
('makro_flyer.pdf', 'Makro', DATE '2024-09-01', DATE '2024-09-30', true),
('globus_flyer.pdf', 'Globus', DATE '2024-10-10', DATE '2024-10-20', true),
('tamda_foods_flyer.pdf', 'Tamda Foods', DATE '2024-10-16', DATE '2024-11-05', true),
('ratio_flyer.pdf', 'Ratio', DATE '2024-10-10', DATE '2024-10-20', false))
SELECT shop_name, string_agg(filename, ',' ORDER BY filename) AS files_csv
FROM meta
WHERE DATE '2024-10-15' BETWEEN valid_from AND valid_to
GROUP BY shop_name
ORDER BY shop_name